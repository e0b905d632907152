"""Latent ODE on frictionless pendulum video.

Rebuilds the reference's LatentODE training script
(examples/pendulum_friction-less/model_train_LatentODE.jl): same skeleton as
GOKU training but with ``model_type = LatentODE()``, a 16-dim neural vector
field (``NODE(16)``), decay 1e-4, seed 1.

Usage: python train_latent_ode.py [--epochs N] [--augment-dim A]
"""
import argparse
import os
import sys

import jax

from latentdiffeq.models import (LatentODE, LatentDiffEqModel, NODE,
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from create_data import load_or_generate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--latent-dim", type=int, default=16)
    ap.add_argument("--augment-dim", type=int, default=0,
                    help="augmented NODE (reference shows NODE(2, "
                         "augment_dim=2) as the alternative, "
                         "model_train_LatentODE.jl:36)")
    ap.add_argument("--pallas-solve", action="store_true",
                    help="run the NODE solve as one Pallas kernel (weights "
                         "+ backward in VMEM; pays for wide fields, "
                         "benchmarks/RESULTS.md 'where Pallas pays')")
    ap.add_argument("--seeds", type=int, default=0, metavar="S",
                    help="population training: S seeds at once, keep the "
                         "argmin-validation replica (0 = single-seed)")
    ap.add_argument("--resume", type=str, default=None)
    args = ap.parse_args()

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)
    input_dim = x.shape[-1]

    from latentdiffeq import make_options
    mt = LatentODE(use_pallas_solve=args.pallas_solve)

    def build(key):
        kn, kl = jax.random.split(key)
        diffeq = NODE(kn, args.latent_dim, augment_dim=args.augment_dim,
                      options=make_options(adaptive=False, substeps=1))
        enc, dec = default_layers(kl, mt, input_dim, diffeq)
        return LatentDiffEqModel.build(mt, enc, dec)

    cfg = TrainConfig(lr=args.lr, decay=args.decay,
                      batch_size=args.batch_size, seq_len=args.seq_len,
                      epochs=args.epochs, seed=args.seed,
                      checkpoint_dir=os.path.join(
                          os.path.dirname(os.path.abspath(__file__)),
                          "output_latent_ode"))

    if args.seeds:
        if args.resume:
            ap.error("--seeds is incompatible with --resume")
        from latentdiffeq.train import MultiSeedTrainer
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(build, cfg, seeds)
        ms.fit(train_set, val_set)
        print(f"winner: seed {ms.best_seed} (val {ms.best_val_loss:.4f}) "
              f"-> {cfg.checkpoint_dir}/best_model.npz")
        return

    trainer = Trainer(build(jax.random.PRNGKey(args.seed)), cfg)
    if args.resume:
        trainer.restore(args.resume)
    trainer.fit(train_set, val_set)


if __name__ == "__main__":
    main()
