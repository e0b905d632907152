"""Time-to-gate: seconds on one chip to reach flagship quality.

The headline metric VERDICT round 2 asked for: wall-clock (training only)
until the best-so-far weights satisfy the flagship gate

    angle_corr_median >= 0.95  AND  length_abs_err_median <= 0.05

on the full validation set. The per-epoch speed story (BENCH: ~150x the
CPU proxy) says nothing about how fast a user actually GETS a model; this
harness trains a recipe in eval-every-N-epoch slices, clocks only the
training segments, evaluates the current best weights after each slice,
and records the first crossing.

Recipes (see RESULTS.md "time-to-gate" table for measured results):
- baseline: the round-2 flagship single-seed recipe (batch 64).
- large-batch: fewer, bigger optimizer steps with scaled lr — the MFU
  table says the chip is latency-bound at batch 64, so a full-batch epoch
  costs about one batch-64 STEP.
- population + pruning: start S seeds, drop the val-loss laggards at
  --prune-at epochs (collapsed tapes reveal themselves early), spend the
  remaining wall-clock on survivors.
- bf16: --dtype bf16 on any of the above.

Usage:
    python benchmarks/time_to_gate.py --tag ttg_base --epochs 3000
    python benchmarks/time_to_gate.py --tag ttg_pop8_prune \
        --seeds 8 --prune-at 500 --prune-keep 2 --epochs 3000
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quality_goku import evaluate, forecast_eval  # noqa: E402

GATE_CORR = 0.95
GATE_LERR = 0.05


def _cache_policy():
    """Compile-cache policy (set BEFORE any compile — called from the
    __main__ guard so merely IMPORTING this module, e.g. for forecast_eval
    re-export compatibility, never clobbers the caller's cache dir):
    time-to-gate counts compile time inside train_s, so the cache state is
    part of the recipe. --cache cold (the default) isolates the run in a
    throwaway cache dir — the honest "first run on a fresh machine"
    number; --cache warm reuses the repo cache — the steady-state number
    for a user iterating on one machine. Parsed pre-argparse so it runs
    before main() builds any program."""
    if ("--cache" in sys.argv
            and sys.argv[sys.argv.index("--cache") + 1] == "warm"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
    else:
        import tempfile
        jax.config.update("jax_compilation_cache_dir",
                          tempfile.mkdtemp(prefix="ttg_cache_"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=333)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--progressive", action="store_true", default=True)
    ap.add_argument("--no-progressive", dest="progressive",
                    action="store_false")
    ap.add_argument("--prog-duration", type=int, default=300)
    ap.add_argument("--start-seq-len", type=int, default=20)
    ap.add_argument("--prog-step", type=int, default=5,
                    help="seq-len quantization step during the ramp: each "
                    "distinct length compiles one program, so step 20 "
                    "gives 5 compiled shapes (20/40/60/80/100) vs 17 at "
                    "the default 5")
    ap.add_argument("--masked", action="store_true",
                    help="masked single-compile curriculum "
                    "(TrainConfig.masked_curriculum): the whole seq-len "
                    "ramp runs ONE compiled program — kills the per-length "
                    "compile cost that dominates cold-cache ramps; "
                    "combine with --prog-step 1 for the reference's exact "
                    "one-length-per-epoch curriculum")
    ap.add_argument("--free-bits", type=float, default=0.0)
    ap.add_argument("--dispatch", type=int, default=25)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--seeds", type=int, default=0,
                    help="population width (0 = single-seed Trainer)")
    ap.add_argument("--prune-at", type=int, default=0,
                    help="epoch at which to prune the population")
    ap.add_argument("--prune-keep", type=int, default=2,
                    help="how many best-val replicas survive the prune")
    ap.add_argument("--prune-by", default="val", choices=["val", "pixel"],
                    help="prune ranking: 'val' = best-carry validation "
                    "loss (the round-2 default — measured NOT to rank "
                    "identifiable charts, selector_probe.json); 'pixel' = "
                    "corr(theta_hat, theta read from the observed frames "
                    "via the renderer geometry) — the pixels-only domain "
                    "observable, no latent ground truth "
                    "(selector_probe.pixel_angle_corr)")
    ap.add_argument("--select-by", default="val",
                    choices=["val", "pixel", "pixel-forecast",
                             "pixel-composite"],
                    help="population winner selection at each gate eval: "
                    "'val' = argmin best-carry validation loss (round-2 "
                    "default; measured blind to chart identifiability); "
                    "'pixel' = argmax pixel-angle corr over every "
                    "replica's best-carry AND live weights (observations "
                    "only — the unsupervised protocol a user without "
                    "latent ground truth would run); 'pixel-forecast' = "
                    "argmax pixel-angle corr on the frames BEYOND the "
                    "encoder context (observations only too — probe-"
                    "validated against true beyond-context corr at "
                    "Spearman 1.0 / max gap 0.0024, "
                    "selector_forecast_probe.json); 'pixel-composite' = "
                    "pixel-forecast among replicas whose in-context "
                    "pixel corr clears 0.95 (beyond-corr alone is "
                    "gameable early — RESULTS.md forecast section)")
    ap.add_argument("--gate-metric", default="incontext",
                    choices=["incontext", "forecast", "both"],
                    help="'incontext' = the flagship gate (corr >= 0.95, "
                    "L err <= 0.05); 'forecast' = TRUE beyond-context "
                    "angle corr >= --forecast-gate-corr ALONE (measured "
                    "gameable early in training: epoch-100 replicas "
                    "track the beyond-window phase at 0.85 with L err "
                    "0.35 — diagnostic record ttg_fc_pop8_px.json); "
                    "'both' = the flagship gate AND the forecast bar — "
                    "identified the physics in-window and extrapolates")
    ap.add_argument("--forecast-gate-corr", type=float, default=0.80,
                    help="forecast gate threshold (0.80: just below the "
                    "best committed record, the 957 s pop8 polish at "
                    "0.825)")
    ap.add_argument("--context", type=int, default=50,
                    help="encoder context length for forecast selection/"
                    "gating (the training window)")
    ap.add_argument("--cache", default="cold", choices=["cold", "warm"],
                    help="compile-cache policy (consumed pre-argparse at "
                    "import; declared here for --help and the record)")
    ap.add_argument("--warm-start", action="store_true",
                    help="pixel-readout warm start before ELBO training "
                    "(pixel_observable.warm_start_pendulum): regress each "
                    "replica's encode->latent_out path onto (theta, omega)"
                    " read from the observed frames and L from the "
                    "dynamics residual — observations only. Warm-start "
                    "wall-clock (incl. its compile) COUNTS toward "
                    "time-to-gate.")
    ap.add_argument("--warm-steps", type=int, default=300)
    ap.add_argument("--warm-window", type=int, default=50)
    ap.add_argument("--warm-offsets", type=int, nargs="*",
                    default=[0, 25, 50])
    ap.add_argument("--warm-sub", type=int, default=0,
                    help="subsample the warm-start regression to the first "
                    "N training trajectories (0 = all) — the regression "
                    "only needs enough data to land the basin")
    ap.add_argument("--val-every-epoch", action="store_true",
                    help="compute the full-val loss once per epoch instead "
                    "of once per minibatch (TrainConfig.val_every_batch="
                    "False). The reference evaluates val every minibatch "
                    "(model_train.jl:204) — parity default — but with 6 "
                    "minibatches/epoch that is 6 full-val forwards per "
                    "epoch of pure selection overhead; per-epoch val only "
                    "coarsens WHICH step the best-val carry can pick.")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--save-population", default=None,
                    help="path to save_population() the final state for "
                    "post-hoc selector analysis (population runs only)")
    ap.add_argument("--stop-at-gate", action="store_true", default=True)
    ap.add_argument("--no-stop-at-gate", dest="stop_at_gate",
                    action="store_false")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import (MultiSeedTrainer, TrainConfig, Trainer,
                                    splitobs)
    from create_data import load_or_generate
    from pendulum import Pendulum

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1,
                                           unroll=args.unroll))

    def init_fn(k):
        enc, dec = default_layers(k, GOKUBasic(), x.shape[-1], diffeq,
                                  dtype=dtype)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(
        lr=args.lr, decay=args.decay, batch_size=args.batch_size,
        seq_len=args.seq_len, epochs=args.epochs, seed=args.seed,
        start_beta=0.0, end_beta=1.0, n_cycle=4, ratio=0.9,
        progressive_training=args.progressive,
        prog_training_duration=args.prog_duration,
        start_seq_len=args.start_seq_len,
        prog_seq_len_step=args.prog_step, free_bits=args.free_bits,
        masked_curriculum=args.masked,
        val_every_batch=not args.val_every_epoch,
        epochs_per_dispatch=args.dispatch, save_best=False)

    if args.seeds:
        tr = MultiSeedTrainer(
            init_fn, cfg, list(range(args.seed, args.seed + args.seeds)))
        if args.select_by != "val" or args.prune_by == "pixel":
            from pixel_observable import (
                pixel_angles, population_pixel_composite_scores,
                population_pixel_forecast_scores, population_pixel_scores)
            th_obs = pixel_angles(val_set)
            pixel_score = lambda m: population_pixel_scores(  # noqa: E731
                m, val_set, th_obs, cfg.dt)
        if args.select_by != "val":
            if args.select_by == "pixel-forecast":
                select_score = lambda m: (  # noqa: E731
                    population_pixel_forecast_scores(
                        m, val_set, th_obs, cfg.dt, args.context))
            elif args.select_by == "pixel-composite":
                select_score = lambda m: (  # noqa: E731
                    population_pixel_composite_scores(
                        m, val_set, th_obs, cfg.dt, args.context))
            else:
                select_score = pixel_score

            def get_best():
                # score every replica's best-carry AND live weights; ship
                # the argmax — observations only, no latent ground truth
                model, _ = tr.select(select_score)
                return model
        else:
            get_best = lambda: tr.best_model  # noqa: E731
    else:
        tr = Trainer(init_fn(jax.random.PRNGKey(args.seed)), cfg)
        get_best = lambda: (tr.best_model  # noqa: E731
                            if tr._best_dev is not None else tr.model)

    trace = []
    train_s = 0.0
    warm_s = None
    if args.warm_start:
        from pixel_observable import (pendulum_pixel_estimates,
                                      warm_start_pendulum)
        t0 = time.perf_counter()
        xw = (train_set[:args.warm_sub] if args.warm_sub else train_set)
        est = pendulum_pixel_estimates(xw, cfg.dt)
        warm_fn = lambda m: warm_start_pendulum(  # noqa: E731
            m, xw, cfg.dt, window=args.warm_window,
            offsets=tuple(args.warm_offsets),
            steps=args.warm_steps, estimates=est)[0]
        if args.seeds:
            tr.warm_start(warm_fn)
            jax.block_until_ready(jax.tree_util.tree_leaves(tr.models)[0])
        else:
            tr.model = jax.jit(warm_fn)(tr.model)
            jax.block_until_ready(jax.tree_util.tree_leaves(tr.model)[0])
        warm_s = time.perf_counter() - t0
        train_s += warm_s
        print(f"warm start: {warm_s:.1f}s ({args.warm_steps} steps, "
              f"window {args.warm_window})", flush=True)
    gate_s = None
    gate_epoch = None
    pruned = False
    e = 0
    while e < args.epochs:
        e_next = min(e + args.eval_every, args.epochs)
        if (args.seeds and args.prune_at and not pruned
                and e_next >= args.prune_at):
            e_next = min(e_next, args.prune_at)
        t0 = time.perf_counter()
        tr.fit(train_set, val_set, epochs=e_next, verbose=False)
        jax.block_until_ready(jax.tree_util.tree_leaves(
            tr._best["val"] if args.seeds else tr.model)[0])
        train_s += time.perf_counter() - t0
        e = e_next

        if args.seeds and args.prune_at and not pruned and e >= args.prune_at:
            if args.prune_by == "pixel":
                scores = -np.maximum(pixel_score(tr.models),
                                     pixel_score(tr.stacked_best_models))
                vals = np.where(np.isfinite(scores), scores, np.inf)
            else:
                vals = np.asarray(tr.per_seed_best_vals)
                vals = np.where(np.isfinite(vals), vals, np.inf)
            keep = list(np.argsort(vals)[:args.prune_keep])
            dropped = [tr.seeds[i] for i in range(len(vals))
                       if i not in keep]
            print(f"epoch {e}: per-seed {args.prune_by} prune scores "
                  f"{[round(float(v), 4) for v in vals]}", flush=True)
            tr.prune(keep)
            pruned = True
            print(f"epoch {e}: pruned to seeds {tr.seeds} "
                  f"(dropped {dropped})", flush=True)

        winner = get_best()
        m = evaluate(winner, val_set, val_latent, val_ps, cfg.dt)
        rec = {"epoch": e, "train_s": round(train_s, 2),
               "angle_corr_median": round(m["angle_corr_median"], 4),
               "length_abs_err_median": round(m["length_abs_err_median"],
                                              4)}
        in_gate = (m["angle_corr_median"] >= GATE_CORR
                   and m["length_abs_err_median"] <= GATE_LERR)
        if args.gate_metric in ("forecast", "both"):
            fc = forecast_eval(winner, val_set, val_latent, cfg.dt,
                               args.context)
            rec["forecast_corr_beyond_median"] = round(
                fc["forecast_corr_beyond_median"], 4)
            rec["forecast_mse_beyond"] = round(fc["forecast_mse_beyond"], 5)
            fc_gate = (fc["forecast_corr_beyond_median"]
                       >= args.forecast_gate_corr)
            gated = fc_gate if args.gate_metric == "forecast" \
                else (in_gate and fc_gate)
        else:
            gated = in_gate
        trace.append(rec)
        print(json.dumps(rec), flush=True)
        if gate_s is None and gated:
            gate_s = train_s
            gate_epoch = e
            if args.stop_at_gate:
                break

    if args.seeds and args.save_population:
        tr.save_population(args.save_population)

    final_model = get_best()
    final = evaluate(final_model, val_set, val_latent, val_ps, cfg.dt)
    gate_spec = {"angle_corr_median": GATE_CORR,
                 "length_abs_err_median": GATE_LERR}
    if args.gate_metric in ("forecast", "both"):
        final.update(forecast_eval(final_model, val_set, val_latent,
                                   cfg.dt, args.context))
        fc_spec = {"forecast_corr_beyond_median": args.forecast_gate_corr,
                   "context_len": args.context}
        gate_spec = fc_spec if args.gate_metric == "forecast" \
            else {**gate_spec, **fc_spec}
    record = {
        "tag": args.tag,
        "config": {k: v for k, v in vars(args).items() if k != "out"},
        "gate": gate_spec,
        "time_to_gate_s": gate_s, "gate_epoch": gate_epoch,
        "train_s_total": train_s, "warm_start_s": warm_s,
        "trace": trace, "final": final,
    }
    out = args.out or os.path.join(ROOT, "benchmarks",
                                   f"ttg_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in
                      ("tag", "time_to_gate_s", "gate_epoch",
                       "train_s_total")}, indent=2))


if __name__ == "__main__":
    _cache_policy()
    main()
