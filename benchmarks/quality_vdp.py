"""Quality/identifiability record for the user-defined mechanistic
template (BASELINE.json config 4): GOKU on Van der Pol with learned mu.

The pendulum records prove the flagship specs; this harness proves the
CUSTOM-dynamics path end to end — a user-written diffeq spec
(examples/custom_dynamics/custom.py::VanDerPol, the role of the
reference's user-side pendulum.jl structs) trained through the same
GOKU template, with the mechanistic parameter recovered from
observations only. Observations are a fixed random linear+relu lift of
the 2-d state to 64 channels (train_vdp.py::make_data), so mu is only
inferable through the dynamics.

Metrics (full val set, deterministic encode):
- mu_abs_err_median / mu_corr: |mu_hat - mu| over val trajectories
  (mu ~ U(0.5, 2)) and Pearson corr of mu_hat vs mu.
- state_corr_median: sign-aligned per-trajectory Pearson corr of latent
  dim 0 vs the true VdP x-coordinate (the chart check).
- val_recon_mse: recon MSE in the normalized observation space.

Usage:
    python benchmarks/quality_vdp.py --seeds 4 --epochs 2000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quality_goku import pearson_rows  # noqa: E402
from train_vdp import make_data  # noqa: E402

from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                Trainer, splitobs)

DT = 0.1


def build_model_keyed(input_dim: int, key, vdp):
    enc, dec = default_layers(key, GOKUBasic(), input_dim, vdp,
                              hidden_dim_resnet=100,
                              latent_to_diffeq_dim=100)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def drift_twin(model):
    """Noise-free eval twin for the stochastic VdP workload: swap the SDE
    spec for the drift ODE (identical trained weights; the mechanistic
    diffeq slot holds no parameters). Same rationale as
    quality_variants.drift_twin."""
    import dataclasses

    from custom import VanDerPol
    from latentdiffeq import make_options
    dec = dataclasses.replace(model.decoder, diffeq=VanDerPol(
        options=make_options(adaptive=False, substeps=4)))
    return dataclasses.replace(model, decoder=dec)


def evaluate(model, val_set, val_z, val_mus) -> dict:
    x = jnp.asarray(val_set)
    T = x.shape[1]
    t = jnp.arange(T, dtype=jnp.float32) * DT

    @jax.jit
    def fwd(m, xv):
        mu, logvar = m.encoder(xv)
        out, aux = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return out, aux

    (x_hat, z_hat, l_hat), aux = fwd(model, x)
    z = np.asarray(z_hat)                          # (n, T, 2)
    true_x = np.asarray(val_z)[:, :T, 0]
    mu_true = np.asarray(val_mus).reshape(-1)
    mu_hat = np.asarray(l_hat[1]).reshape(-1)

    r = pearson_rows(z[:, :, 0], true_x)
    sign = float(np.sign(np.median(r))) or 1.0
    err = np.abs(mu_hat - mu_true)
    return {
        "val_recon_mse": float(np.mean((np.asarray(x) -
                                        np.asarray(x_hat)) ** 2)),
        "state_corr_median": float(np.median(sign * r)),
        "state_corr_min": float(np.min(sign * r)),
        "mu_abs_err_median": float(np.median(err)),
        "mu_abs_err_mean": float(np.mean(err)),
        "mu_abs_err_max": float(np.max(err)),
        "mu_corr": float(np.corrcoef(mu_hat, mu_true)[0, 1]),
        "mu_range_true": [float(mu_true.min()), float(mu_true.max())],
        "n_val_failed": int(np.sum(~np.asarray(aux["success"]))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="vdp_pop4")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--progressive", action="store_true",
                    help="seq-len curriculum (the flagship recipe's "
                         "identifiability lever)")
    ap.add_argument("--prog-duration", type=int, default=300)
    ap.add_argument("--start-seq-len", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=1e-3)
    ap.add_argument("--free-bits", type=float, default=0.0)
    ap.add_argument("--end-beta", type=float, default=1.0,
                    help="KL-annealing ceiling; the reference's own "
                         "hard-identification script pins a tiny fixed "
                         "beta (model_train_original_data.jl:44-45)")
    ap.add_argument("--n-cycle", type=int, default=4)
    ap.add_argument("--mu-max", type=float, default=2.0,
                    help="upper end of the true mu range; 4.0 reaches "
                         "the relaxation regime where the period is "
                         "mu-dependent (the identifiable setting)")
    ap.add_argument("--dispatch", type=int, default=25)
    ap.add_argument("--stochastic-sigma", type=float, default=0.0,
                    help="> 0: the MULTIPLICATIVE-noise SDE workload "
                    "du = f dt + sigma*u dW, trained through the "
                    "diagonal-noise SRI solver (SRIW1/SOSRI, adaptive "
                    "dyadic VBT stepping) — the reference SOSRI()'s "
                    "actual noise class, end to end")
    ap.add_argument("--eval-ckpt", default=None)
    ap.add_argument("--eval-population", default=None,
                    help="path to a save_population() checkpoint: restore "
                    "and evaluate EVERY replica (live and best-carry, "
                    "drift twin for SDE workloads), no training — the "
                    "per-seed report card for a finished campaign run")
    args = ap.parse_args()

    x, z, mus, vdp = make_data(mu_max=args.mu_max,
                               stochastic_sigma=args.stochastic_sigma)
    train_set, val_set = splitobs(x, 0.9)
    _, val_z = splitobs(z, 0.9)
    _, val_mus = splitobs(mus, 0.9)

    outdir = os.path.join(ROOT, "benchmarks", "output_quality", args.tag)
    cfg = TrainConfig(
        lr=args.lr, decay=args.decay, batch_size=args.batch_size,
        seq_len=args.seq_len, epochs=args.epochs, seed=args.seed, dt=DT,
        start_beta=0.0, end_beta=args.end_beta, n_cycle=args.n_cycle,
        ratio=0.9,
        progressive_training=args.progressive,
        prog_training_duration=args.prog_duration,
        start_seq_len=args.start_seq_len,
        free_bits=args.free_bits, epochs_per_dispatch=args.dispatch,
        checkpoint_dir=outdir)

    if args.eval_ckpt:
        from latentdiffeq.train.checkpoint import load_checkpoint
        tr = Trainer(build_model_keyed(x.shape[-1],
                                       jax.random.PRNGKey(args.seed), vdp),
                     cfg)
        tree, meta = load_checkpoint(
            args.eval_ckpt, {"model": tr.model, "opt_state": tr.opt_state,
                             "key": tr.key})
        rec = {"tag": args.tag, "ckpt": args.eval_ckpt,
               "meta_epoch": meta.get("epoch"),
               "best": evaluate(tree["model"], val_set, val_z, val_mus)}
        print(json.dumps(rec, indent=2))
        return

    if args.eval_population:
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(
            lambda k: build_model_keyed(x.shape[-1], k, vdp), cfg, seeds)
        ms.restore(args.eval_population)
        rows = []
        for i in range(ms.n_seeds):
            for side, m in (("live", ms.seed_model(i)),
                            ("best", ms.best_seed_model(i))):
                if args.stochastic_sigma:
                    m = drift_twin(m)
                e = evaluate(m, val_set, val_z, val_mus)
                rows.append({"seed": ms.seeds[i], "side": side,
                             **{k: (round(v, 4) if isinstance(v, float)
                                    else v) for k, v in e.items()
                                if "range" not in k}})
                print(json.dumps(rows[-1]), flush=True)
        rec = {"tag": args.tag, "population": args.eval_population,
               "epoch": ms.epoch,
               "drift_twin": bool(args.stochastic_sigma),
               "per_seed_best_val": [v if np.isfinite(v) else None
                                     for v in ms.per_seed_best_vals],
               "rows": rows}
        out = os.path.join(ROOT, "benchmarks",
                           f"quality_{args.tag}_per_seed.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
        return

    t0 = time.perf_counter()
    if args.seeds:
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(
            lambda k: build_model_keyed(x.shape[-1], k, vdp), cfg, seeds)
        ms.fit(train_set, val_set, verbose=True)
        best, winner = ms.best_model, ms.best_seed
        per_seed = [v if np.isfinite(v) else None
                    for v in ms.per_seed_best_vals]
    else:
        tr = Trainer(build_model_keyed(x.shape[-1],
                                       jax.random.PRNGKey(args.seed), vdp),
                     cfg)
        tr.fit(train_set, val_set, verbose=True, log_every=100)
        best = tr.best_model if tr._best_dev is not None else tr.model
        winner, per_seed = args.seed, None
    total = time.perf_counter() - t0

    record = {
        "tag": args.tag,
        "workload": "vdp_sde" if args.stochastic_sigma else "vdp",
        "config": vars(args),
        "total_s": total, "winner_seed": winner,
        "per_seed_best_val": per_seed,
        "best": evaluate(best, val_set, val_z, val_mus),
    }
    if args.stochastic_sigma:
        record["best_drift"] = evaluate(drift_twin(best), val_set, val_z,
                                        val_mus)
    out = os.path.join(ROOT, "benchmarks", f"quality_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
