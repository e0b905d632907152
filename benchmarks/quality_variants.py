"""Quality runs for the non-flagship workloads.

The flagship quality gate (quality_goku.py + tests/test_quality_gate.py)
covers GOKU on the frictionless pendulum. This harness extends the
convergence-quality evidence to the reference's remaining specs
(reference: examples/pendulum_friction-less/pendulum.jl, nODE.jl):

- ``friction``   GOKU + damped pendulum (Pendulum_friction, pendulum.jl:51-91)
                 on video data generated from the damped dynamics.
- ``spendulum``  GOKU + stochastic pendulum (SPendulum, pendulum.jl:96-140):
                 the latent diffeq is an additive-noise SDE solved with SRA1
                 over a virtual Brownian tree; data is the standard
                 frictionless video set (the reference trains SPendulum as a
                 drop-in spec on the same data).
- ``latent_ode`` LatentODE + NODE(16) (model_train_LatentODE.jl): no
                 mechanistic parameter to identify, so the metric is recon
                 MSE plus the best-single-dim angle correlation as a
                 diagnostic (the 16-dim neural latent has no preferred axis).

Usage:
    python benchmarks/quality_variants.py --workload friction --epochs 3000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from quality_goku import evaluate, pearson_rows  # noqa: E402


def friction_data():
    """Damped-pendulum video set, cached separately from the flagship set."""
    from create_data import load_or_generate
    from pendulum import PendulumFriction
    path = os.path.join(ROOT, "examples", "pendulum", "data",
                        "pendulum_friction_data.npz")
    return load_or_generate(path, diffeq=PendulumFriction())


def standard_data():
    from create_data import load_or_generate
    return load_or_generate()


def evaluate_latent_ode(model, val_set, val_latent, dt: float) -> dict:
    """Recon MSE + best-single-dim sign-aligned angle correlation."""
    import jax.numpy as jnp
    x = jnp.asarray(val_set)
    T = x.shape[1]
    t = jnp.arange(T, dtype=jnp.float32) * dt

    @jax.jit
    def fwd(m, xv):
        mu, logvar = m.encoder(xv)
        out, aux = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return out, aux

    (x_hat, z_hat, _), aux = fwd(model, x)
    z = np.asarray(z_hat)                           # (n, T, z_dim)
    true_angle = np.asarray(val_latent)[:, :T, 0]
    # no preferred latent axis: per-dim |corr|, take the best dim
    per_dim = [np.abs(pearson_rows(z[:, :, d], true_angle))
               for d in range(z.shape[-1])]
    best_dim = int(np.argmax([np.median(c) for c in per_dim]))

    # linear decodability: the 16-dim neural latent mixes the angle across
    # dims, so probe it with a ridge readout fitted on half the val
    # trajectories and scored (R^2) on the held-out half
    n = z.shape[0]
    half = n // 2
    feats = lambda zz: zz.reshape(-1, z.shape[-1])
    A, Ate = feats(z[:half]), feats(z[half:])
    y, yte = true_angle[:half].reshape(-1), true_angle[half:].reshape(-1)
    A1 = np.concatenate([A, np.ones((A.shape[0], 1))], axis=1)
    w = np.linalg.solve(A1.T @ A1 + 1e-3 * np.eye(A1.shape[1]), A1.T @ y)
    pred = np.concatenate([Ate, np.ones((Ate.shape[0], 1))], axis=1) @ w
    r2 = 1.0 - np.sum((yte - pred) ** 2) / np.sum((yte - yte.mean()) ** 2)

    # NONLINEAR decodability (VERDICT r2 item 9: readout-based eval):
    # the neural latent may encode the angle on a curved chart (e.g.
    # sin/cos-like coordinates), which a global linear map cannot read.
    # Probe with random-Fourier-feature ridge regression — deterministic
    # (fixed seed), fitted on the same half split, scored R^2 held-out.
    rng = np.random.default_rng(0)
    zmu = A.mean(axis=0, keepdims=True)
    zs = A.std(axis=0, keepdims=True) + 1e-8
    omega = rng.normal(size=(z.shape[-1], 256))      # unit lengthscale in
    phase = rng.uniform(0, 2 * np.pi, size=(256,))   # standardized coords
    rff = lambda M: np.cos(((M - zmu) / zs) @ omega + phase)
    F, Fte = rff(A), rff(Ate)
    F1 = np.concatenate([F, np.ones((F.shape[0], 1))], axis=1)
    wn = np.linalg.solve(F1.T @ F1 + 1e-2 * np.eye(F1.shape[1]), F1.T @ y)
    predn = np.concatenate([Fte, np.ones((Fte.shape[0], 1))], axis=1) @ wn
    r2n = 1.0 - np.sum((yte - predn) ** 2) / np.sum((yte - yte.mean()) ** 2)

    # per-TRAJECTORY chart: the global probes can both fail while the
    # angle is still perfectly decodable with a trajectory-specific
    # linear map (the neural latent has no canonical frame across
    # trajectories — each ODE solution may live on its own affine chart).
    # Fit w,b per trajectory on the even frames, score R^2 on the odd
    # frames (interleaved split: tests the chart, not temporal
    # extrapolation); report the median over trajectories.
    r2_traj = []
    for i in range(z.shape[0]):
        ze, zo = z[i, 0::2], z[i, 1::2]
        Ai = np.concatenate([ze, np.ones((ze.shape[0], 1))], axis=1)
        Bi = np.concatenate([zo, np.ones((zo.shape[0], 1))], axis=1)
        yi, yti = true_angle[i, 0::2], true_angle[i, 1::2]
        wi = np.linalg.solve(Ai.T @ Ai + 1e-3 * np.eye(Ai.shape[1]),
                             Ai.T @ yi)
        pi = Bi @ wi
        r2_traj.append(1.0 - np.sum((yti - pi) ** 2)
                       / (np.sum((yti - yti.mean()) ** 2) + 1e-12))
    r2_traj_med = float(np.median(r2_traj))

    return {
        "val_recon_mse_per_pixel": float(
            np.mean((np.asarray(x) - np.asarray(x_hat)) ** 2)),
        "angle_abs_corr_best_dim_median": float(
            np.median(per_dim[best_dim])),
        "best_dim": best_dim,
        "angle_linear_readout_r2": float(r2),
        "angle_rff_readout_r2": float(r2n),
        "angle_pertraj_affine_r2_median": r2_traj_med,
        "n_val_failed": int(np.sum(~np.asarray(aux["success"]))),
    }


def drift_twin(model):
    """Noise-free eval twin for the stochastic workload: swap the SDE spec
    for its drift ODE (identical trained weights — the mechanistic diffeq
    slot holds no parameters). Decoding one stochastic SRA1 path
    conditions the angle metric on a single noise draw; the drift solve
    evaluates the *identified dynamics* themselves. Reference analogue:
    evaluating an SDE posterior by its mean path."""
    import dataclasses
    from latentdiffeq import make_options
    from pendulum import Pendulum
    dec = dataclasses.replace(model.decoder, diffeq=Pendulum(
        options=make_options(adaptive=False, substeps=1)))
    return dataclasses.replace(model, decoder=dec)


def build_model(workload: str, input_dim: int, seed: int, unroll: int = 1,
                latent_dim: int = 16, augment_dim: int = 0):
    return build_model_keyed(workload, input_dim, jax.random.PRNGKey(seed),
                             unroll, latent_dim, augment_dim)


def build_model_keyed(workload: str, input_dim: int, key, unroll: int = 1,
                      latent_dim: int = 16, augment_dim: int = 0):
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentODE, LatentDiffEqModel,
                                     NODE, default_layers)
    from pendulum import PendulumFriction, SPendulum

    if workload == "friction":
        mt, diffeq = GOKUBasic(), PendulumFriction(
            options=make_options(adaptive=False, substeps=1, unroll=unroll))
    elif workload == "spendulum":
        mt, diffeq = GOKUBasic(), SPendulum()
    elif workload == "spendulum_adaptive":
        # the reference's SOSRI() semantics: adaptive stepping in training
        # (pendulum.jl:103). max_steps sized from a trained-winner probe:
        # ~117 accepted + ~2 rejected per trajectory on the T=100 grid,
        # with a tail needing >192 — 256 covers it with headroom.
        from latentdiffeq.solve.sde import SDEAdaptiveConfig
        mt = GOKUBasic()
        diffeq = SPendulum(adaptive=True, adaptive_cfg=SDEAdaptiveConfig(
            rtol=1e-2, atol=1e-2, max_steps=256, depth_cap=6,
            max_steps_per_interval=6))
    elif workload == "latent_ode":
        kn, key = jax.random.split(key)
        mt = LatentODE()
        diffeq = NODE(kn, latent_dim, augment_dim=augment_dim,
                      options=make_options(adaptive=False, substeps=1,
                                           unroll=unroll))
    else:
        raise ValueError(workload)
    enc, dec = default_layers(key, mt, input_dim, diffeq)
    return LatentDiffEqModel.build(mt, enc, dec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", required=True,
                    choices=["friction", "spendulum", "spendulum_adaptive",
                             "latent_ode"])
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=None,
                    help="default: 1e-3 (GOKU) / 1e-4 (LatentODE, "
                         "model_train_LatentODE.jl)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--progressive", action="store_true", default=True)
    ap.add_argument("--no-progressive", dest="progressive",
                    action="store_false")
    ap.add_argument("--prog-duration", type=int, default=300)
    ap.add_argument("--start-seq-len", type=int, default=20)
    ap.add_argument("--dispatch", type=int, default=25)
    ap.add_argument("--unroll", type=int, default=1,
                    help="fixed-grid scan unroll (ODE workloads)")
    ap.add_argument("--latent-dim", type=int, default=16,
                    help="latent_ode: NODE latent dimension (reference "
                         "default 16, model_train_LatentODE.jl)")
    ap.add_argument("--augment-dim", type=int, default=0,
                    help="latent_ode: ANODE zero-pad dims")
    ap.add_argument("--mask-failures", action="store_true",
                    help="exclude solve-failed samples from the recon loss "
                         "(adaptive SDE budget exhaustion must not poison "
                         "the batch)")
    ap.add_argument("--free-bits", type=float, default=0.0,
                    help="per-dim KL floor (the posterior-collapse guard "
                         "that rescued collapsed flagship tapes, RESULTS.md)")
    ap.add_argument("--seeds", type=int, default=0,
                    help="population training: N seeds (seed..seed+N-1) "
                         "in one vmapped program; evaluates the argmin-"
                         "val replica. 0 = single.")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--eval-ckpt", default=None,
                    help="skip training; evaluate this best_model.npz")
    args = ap.parse_args()

    from latentdiffeq.train import TrainConfig, Trainer, splitobs

    if args.workload == "friction":
        latent, u0s, ps, frames = friction_data()
    else:
        latent, u0s, ps, frames = standard_data()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)

    decay = args.decay if args.decay is not None else (
        1e-4 if args.workload == "latent_ode" else 1e-3)

    tag = args.tag or args.workload
    outdir = os.path.join(ROOT, "benchmarks", "output_quality", tag)
    cfg = TrainConfig(
        lr=args.lr, decay=decay, batch_size=args.batch_size,
        seq_len=args.seq_len, epochs=args.epochs, seed=args.seed,
        start_beta=0.0, end_beta=1.0, n_cycle=4, ratio=0.9,
        progressive_training=args.progressive,
        prog_training_duration=args.prog_duration,
        start_seq_len=args.start_seq_len,
        free_bits=args.free_bits,
        mask_failures=args.mask_failures,
        epochs_per_dispatch=args.dispatch,
        checkpoint_dir=outdir)

    if args.eval_ckpt:
        from latentdiffeq.train.checkpoint import load_checkpoint
        trainer = Trainer(build_model(args.workload, x.shape[-1],
                                      args.seed, args.unroll,
                                      args.latent_dim, args.augment_dim),
                          cfg)
        tree, meta = load_checkpoint(
            args.eval_ckpt, {"model": trainer.model,
                             "opt_state": trainer.opt_state,
                             "key": trainer.key})
        if args.workload == "latent_ode":
            m = evaluate_latent_ode(tree["model"], val_set, val_latent,
                                    cfg.dt)
        else:
            m = evaluate(tree["model"], val_set, val_latent, val_ps, cfg.dt)
        rec = {"tag": tag, "workload": args.workload,
               "ckpt": args.eval_ckpt, "meta_epoch": meta.get("epoch"),
               "best": m}
        if args.workload.startswith("spendulum"):
            rec["best_drift"] = evaluate(drift_twin(tree["model"]), val_set,
                                         val_latent, val_ps, cfg.dt)
        print(json.dumps(rec, indent=2))
        return

    if args.seeds:
        from latentdiffeq.train import MultiSeedTrainer
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(
            lambda k: build_model_keyed(args.workload, x.shape[-1], k,
                                        args.unroll, args.latent_dim,
                                        args.augment_dim), cfg, seeds)
        t0 = time.perf_counter()
        ms.fit(train_set, val_set, verbose=True)
        total = time.perf_counter() - t0
        best = ms.best_model
        if args.workload == "latent_ode":
            metrics = evaluate_latent_ode(best, val_set, val_latent, cfg.dt)
        else:
            metrics = evaluate(best, val_set, val_latent, val_ps, cfg.dt)
        record = {
            "tag": tag, "workload": args.workload, "config": vars(args),
            "total_s": total, "winner_seed": ms.best_seed,
            "per_seed_best_val": [v if np.isfinite(v) else None
                                  for v in ms.per_seed_best_vals],
            "best_val_loss": (ms.best_val_loss
                              if np.isfinite(ms.best_val_loss) else None),
            "best": metrics,
        }
        if args.workload.startswith("spendulum"):
            record["best_drift"] = evaluate(drift_twin(best), val_set,
                                            val_latent, val_ps, cfg.dt)
        out = os.path.join(ROOT, "benchmarks", f"quality_{tag}.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
        print(json.dumps(record, indent=2))
        return

    trainer = Trainer(build_model(args.workload, x.shape[-1], args.seed,
                                  args.unroll, args.latent_dim,
                                  args.augment_dim), cfg)
    t0 = time.perf_counter()
    trainer.fit(train_set, val_set, verbose=True, log_every=100)
    total = time.perf_counter() - t0

    best = trainer.best_model if trainer._best_dev is not None \
        else trainer.model
    if args.workload == "latent_ode":
        metrics = evaluate_latent_ode(best, val_set, val_latent, cfg.dt)
    else:
        metrics = evaluate(best, val_set, val_latent, val_ps, cfg.dt)

    record = {
        "tag": tag,
        "workload": args.workload,
        "config": vars(args),
        "total_s": total,
        "best_val_loss": float(trainer.best_val_loss),
        "best": metrics,
        "val_loss_trace": [round(r["val_loss"], 4)
                           for r in trainer.history[::25]],
    }
    if args.workload.startswith("spendulum"):
        record["best_drift"] = evaluate(drift_twin(best), val_set,
                                        val_latent, val_ps, cfg.dt)
    out = os.path.join(ROOT, "benchmarks", f"quality_{tag}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
