"""GOKU-net on frictionless pendulum video.

Rebuilds the reference training script (examples/pendulum_friction-less/
model_train.jl) end to end: cached data generation, 90/10 split, GOKU
default layers, ADAMW ELBO training with cyclical KL annealing and random
50-frame windows, per-minibatch validation, best-checkpoint saving, and
per-epoch visualization.

Usage: python train_goku.py [--epochs N] [--batch-size B] [--no-viz]
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from latentdiffeq.models import GOKUBasic, LatentDiffEqModel, default_layers
from latentdiffeq.train import TrainConfig, Trainer, splitobs

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pendulum import Pendulum  # noqa: E402
from create_data import load_or_generate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=333)
    ap.add_argument("--adaptive", action="store_true",
                    help="use adaptive Tsit5 (default: fixed dt grid, the "
                         "same grid the reference's saveat forces)")
    ap.add_argument("--diffeq", default="pendulum",
                    choices=["pendulum", "friction", "spendulum"],
                    help="latent dynamics spec (reference: Pendulum / "
                         "Pendulum_friction / SPendulum, pendulum.jl)")
    ap.add_argument("--free-bits", type=float, default=None,
                    help="per-dim KL floor (posterior-collapse guard). "
                         "Default: 0 for pendulum/spendulum (reference "
                         "parity), 0.1 for friction — both plain seeds "
                         "collapse on the damped workload and the floor "
                         "rescues them (benchmarks/RESULTS.md). Pass 0 "
                         "to force it off.")
    ap.add_argument("--unroll", type=int, default=None,
                    help="solver-scan unroll (identical math; ~2x faster "
                         "epochs on TPU at 49). Default: 49 on TPU, 1 "
                         "elsewhere.")
    ap.add_argument("--seeds", type=int, default=0, metavar="S",
                    help="population training: train S seeds (seed..seed+"
                         "S-1) simultaneously in one vmapped program and "
                         "keep the argmin-validation replica — the TPU-"
                         "native fix for RNG-tape posterior collapse "
                         "(benchmarks/RESULTS.md). 0 = single-seed.")
    ap.add_argument("--progressive", action="store_true",
                    help="progressive-observation curriculum (seq_len "
                         "ramps --start-seq-len -> --seq-len over "
                         "--prog-duration epochs; model_train.jl:142-147)"
                         " — the recipe behind every committed quality "
                         "record.")
    ap.add_argument("--start-seq-len", type=int, default=20)
    ap.add_argument("--prog-duration", type=int, default=300)
    ap.add_argument("--masked", action="store_true",
                    help="masked single-compile curriculum: the whole "
                         "seq-len ramp runs ONE compiled program "
                         "(TrainConfig.masked_curriculum) — identical "
                         "math, no per-length compiles; the fastest "
                         "time-to-quality recipe measured "
                         "(benchmarks/RESULTS.md time-to-gate table). "
                         "Implies --progressive.")
    ap.add_argument("--prune-at", type=int, default=0, metavar="E",
                    help="with --seeds: at epoch E drop all but the "
                         "--prune-keep best-val replicas and spend the "
                         "rest of the budget on the survivors "
                         "(MultiSeedTrainer.prune). Surviving tapes are "
                         "unchanged by the prune (epoch-indexed keys).")
    ap.add_argument("--prune-keep", type=int, default=2)
    ap.add_argument("--select-by", default="val",
                    choices=["val", "pixel", "pixel-composite"],
                    help="with --seeds: how the shipped winner is chosen. "
                         "'val' = argmin best-carry validation loss; "
                         "'pixel' = argmax correlation with the pendulum "
                         "angle read directly from the observed frames "
                         "(pixel_observable.py — observations only, no "
                         "latent ground truth), over every replica's "
                         "best-carry AND live weights. Measured: pixel "
                         "selection reaches the flagship quality gate in "
                         "205 s where best-val selection never does "
                         "(benchmarks/RESULTS.md time-to-gate). "
                         "'pixel-composite' = pixel-FORECAST score among "
                         "replicas whose in-context pixel corr clears "
                         "0.95 — ships the best extrapolator (beyond-"
                         "context corr 0.891 in 516 s vs 0.825 for the "
                         "957 s polish run; RESULTS.md round-4 "
                         "time-to-FORECAST-quality).")
    ap.add_argument("--forecast-ctx", type=int, default=50,
                    help="context length for --select-by "
                         "pixel-composite's beyond-window score")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="NN-stage parameter/activation dtype (the latent "
                         "solve always runs f32). bf16 + --seeds 8 "
                         "--masked --select-by pixel is the fastest, "
                         "best-quality measured recipe (174 s to the "
                         "flagship gate; benchmarks/RESULTS.md).")
    ap.add_argument("--warm-start", action="store_true",
                    help="pixel-readout warm start before ELBO training "
                         "(pixel_observable.warm_start_pendulum): regress "
                         "the encode->latent_out path onto (theta, omega) "
                         "read from the observed frames and an L estimate "
                         "from the dynamics residual — observations only, "
                         "~10-30 s, skips most of the blind basin search "
                         "(benchmarks/RESULTS.md round-5 warm-start "
                         "campaign: composite gate 515.9 s -> 196.9 s). "
                         "Applies to every replica with --seeds. Use with "
                         "--dtype f32: the L estimate (median err 0.008) "
                         "sits below bf16's resolution at L~1.5, and the "
                         "bf16 twin measurably never gates.")
    ap.add_argument("--warm-steps", type=int, default=300)
    ap.add_argument("--no-viz", action="store_true")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--data-parallel", type=int, default=0, metavar="N",
                    help="train data-parallel over an N-device mesh "
                         "(0 = single device; N must divide batch size). "
                         "For multi-host pods call "
                         "latentdiffeq.parallel.initialize_distributed() "
                         "first.")
    args = ap.parse_args()

    # --- data (reference: model_train.jl:84-120; create_data.jl takes the
    # diffeq, so the damped spec trains on damped-dynamics video) ---
    if args.diffeq == "friction":
        from pendulum import PendulumFriction as _PF
        latent, u0s, ps, frames = load_or_generate(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "pendulum_friction_data.npz"),
            diffeq=_PF())
    else:
        latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)  # (n, T, 784)
    train_set, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)
    input_dim = x.shape[-1]

    # --- model (model_train.jl:127-129) ---
    from latentdiffeq import make_options
    from pendulum import PendulumFriction, SPendulum
    unroll = args.unroll if args.unroll is not None else (
        49 if jax.devices()[0].platform == "tpu" else 1)
    options = (make_options(adaptive=True) if args.adaptive
               else make_options(adaptive=False, substeps=1, unroll=unroll))
    if args.diffeq == "spendulum":
        # --adaptive selects per-trajectory dyadic SRA1 stepping — the
        # reference's SOSRI() semantics (pendulum.jl:103)
        from latentdiffeq.solve.sde import SDEAdaptiveConfig
        diffeq = SPendulum(adaptive=args.adaptive,
                           adaptive_cfg=SDEAdaptiveConfig(
                               max_steps=256, depth_cap=6,
                               max_steps_per_interval=6))
    elif args.diffeq == "friction":
        diffeq = PendulumFriction(options=options)
    else:
        diffeq = Pendulum(options=options)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(args.seed)
    enc, dec = default_layers(key, GOKUBasic(), input_dim, diffeq,
                              dtype=dtype)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    free_bits = args.free_bits if args.free_bits is not None else (
        0.1 if args.diffeq == "friction" else 0.0)
    cfg = TrainConfig(lr=args.lr, decay=args.decay,
                      batch_size=args.batch_size, seq_len=args.seq_len,
                      epochs=args.epochs, seed=args.seed,
                      free_bits=free_bits,
                      progressive_training=args.progressive or args.masked,
                      start_seq_len=args.start_seq_len,
                      prog_training_duration=args.prog_duration,
                      prog_seq_len_step=1 if args.masked else 5,
                      masked_curriculum=args.masked,
                      checkpoint_dir=os.path.join(
                          os.path.dirname(os.path.abspath(__file__)),
                          "output"))

    if args.seeds:
        if args.resume:
            ap.error("--seeds is incompatible with --resume (population "
                     "training starts fresh; restore the winner checkpoint"
                     " into a plain Trainer instead)")
        from latentdiffeq.train import MultiSeedTrainer

        def init_fn(k):
            e, d = default_layers(k, GOKUBasic(), input_dim, diffeq,
                                  dtype=dtype)
            return LatentDiffEqModel.build(GOKUBasic(), e, d)

        # with --data-parallel N the SEED axis is sharded over the mesh —
        # population parallelism: each device trains its own replicas
        ms_mesh = None
        if args.data_parallel:
            from latentdiffeq.parallel import make_mesh
            ms_mesh = make_mesh(args.data_parallel)
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(init_fn, cfg, seeds, mesh=ms_mesh)
        if args.warm_start:
            from pixel_observable import (pendulum_pixel_estimates,
                                          warm_start_pendulum)
            est = pendulum_pixel_estimates(train_set, cfg.dt)
            ms.warm_start(lambda m: warm_start_pendulum(
                m, train_set, cfg.dt, steps=args.warm_steps,
                estimates=est)[0])
        if args.prune_at and args.prune_at < args.epochs:
            # wide start, early prune: train everyone to the prune point,
            # keep the best-val replicas, spend the rest on survivors.
            # Epoch-indexed keys make the sliced fit + prune bitwise
            # equivalent to training the survivors alone the whole way.
            ms.fit(train_set, val_set, epochs=args.prune_at)
            vals = np.where(np.isfinite(ms.per_seed_best_vals),
                            ms.per_seed_best_vals, np.inf)
            keep = list(np.argsort(vals)[:args.prune_keep])
            dropped = [s for i, s in enumerate(ms.seeds) if i not in keep]
            ms.prune(sorted(keep))
            print(f"epoch {args.prune_at}: pruned to seeds {ms.seeds} "
                  f"(dropped {dropped})")
        ms.fit(train_set, val_set)
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        ckpt = os.path.join(cfg.checkpoint_dir, "best_model.npz")
        if args.select_by in ("pixel", "pixel-composite"):
            from pixel_observable import (pixel_angles,
                                          population_pixel_scores,
                                          population_pixel_composite_scores)
            th_obs = pixel_angles(val_set)
            if args.select_by == "pixel-composite":
                score_fn = lambda m: population_pixel_composite_scores(  # noqa: E731
                    m, val_set, th_obs, cfg.dt, args.forecast_ctx)
            else:
                score_fn = lambda m: population_pixel_scores(  # noqa: E731
                    m, val_set, th_obs, cfg.dt)
            _, info = ms.select(score_fn)
            ms.save_replica(ckpt, info["index"],
                            from_best=info["from_best"])
            label = ("pixel-composite score"
                     if args.select_by == "pixel-composite"
                     else "pixel-angle corr")
            print(f"winner: seed {info['seed']} ({label} "
                  f"{info['score']:.4f}, "
                  f"{'best-carry' if info['from_best'] else 'live'} "
                  f"weights) -> {ckpt}")
        else:
            ms.save_best(ckpt)
            print(f"winner: seed {ms.best_seed} "
                  f"(val {ms.best_val_loss:.4f}) -> {ckpt}")
        return
    mesh = None
    if args.data_parallel:
        from latentdiffeq.parallel import make_mesh
        mesh = make_mesh(args.data_parallel)
    trainer = Trainer(model, cfg, mesh=mesh)
    if args.resume:
        trainer.restore(args.resume)
    elif args.warm_start:
        from pixel_observable import (pendulum_pixel_estimates,
                                      warm_start_pendulum)
        est = pendulum_pixel_estimates(train_set, cfg.dt)
        trainer.model = jax.jit(lambda m: warm_start_pendulum(
            m, train_set, cfg.dt, steps=args.warm_steps,
            estimates=est)[0])(trainer.model)

    callbacks = []
    if not args.no_viz:
        from latentdiffeq.train.visualize import visualize_val_image

        def viz(tr, rec):
            visualize_val_image(
                tr.model, val_set, val_latent, val_ps, vis_len=60,
                dt=cfg.dt, h=28, w=28,
                path=os.path.join(cfg.checkpoint_dir, "visualization",
                                  f"fig_{rec['epoch']}.png"),
                rng=tr.np_rng)

        callbacks.append(viz)

    trainer.fit(train_set, val_set, callbacks=callbacks)


if __name__ == "__main__":
    main()
