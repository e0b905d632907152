"""Solver-backend sweep (BASELINE.json config 3): fixed-step RK4 vs
adaptive Tsit5, with unrolled vs backsolve vs interpolating gradients.

For each backend: time a jitted GOKU train step on the parity workload
shapes and report steady-state step time, per-step RHS evals, and the
gradient's agreement with the unrolled-fixed oracle.

Usage: python benchmarks/sweep_solvers.py [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=50)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from pendulum import Pendulum
    import latentdiffeq as ldq
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train.losses import loss_batch

    backends = {
        "rk4_fixed_unrolled": dict(
            solver=ldq.RK4(),
            options=ldq.make_options(adaptive=False, substeps=1),
            sensealg=ldq.Unrolled()),
        "tsit5_fixed_unrolled": dict(
            solver=ldq.Tsit5(),
            options=ldq.make_options(adaptive=False, substeps=1),
            sensealg=ldq.Unrolled()),
        "tsit5_fixed_checkpointed": dict(
            solver=ldq.Tsit5(),
            options=ldq.make_options(adaptive=False, substeps=1),
            sensealg=ldq.InterpolatingAdjoint()),
        "tsit5_fixed_backsolve": dict(
            solver=ldq.Tsit5(),
            options=ldq.make_options(adaptive=False, substeps=1),
            sensealg=ldq.BacksolveAdjoint(bwd_substeps=2)),
        "tsit5_adaptive_unrolled": dict(
            solver=ldq.Tsit5(),
            options=ldq.make_options(adaptive=True, max_steps=128),
            sensealg=ldq.Unrolled()),
        "tsit5_adaptive_backsolve": dict(
            solver=ldq.Tsit5(),
            options=ldq.make_options(adaptive=True, max_steps=128),
            sensealg=ldq.BacksolveAdjoint(bwd_substeps=4)),
        "dopri5_adaptive_interp": dict(
            solver=ldq.Dopri5(),
            options=ldq.make_options(adaptive=True, max_steps=128),
            sensealg=ldq.InterpolatingAdjoint(bwd_substeps=4)),
    }

    import dataclasses
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, args.seq_len, 784))
    t = jnp.arange(args.seq_len, dtype=jnp.float32) * 0.05
    key = jax.random.PRNGKey(2)

    def build(spec):
        diffeq = Pendulum(solver=spec["solver"], sensealg=spec["sensealg"],
                          options=spec["options"])
        enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 784,
                                  diffeq)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    def grad_fn(model):
        return jax.grad(lambda m: loss_batch(m, x, t, jnp.float32(0.5),
                                             variational=True,
                                             key=key)[0])(model)

    oracle = None
    results = {}
    for name, spec in backends.items():
        model = build(spec)
        g = jax.jit(grad_fn)
        gv = jax.block_until_ready(g(model))  # compile
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            gv = g(model)
        jax.block_until_ready(gv)
        dt_step = (time.perf_counter() - t0) / n

        _, metrics = loss_batch(model, x, t, jnp.float32(0.5),
                                variational=True, key=key)
        flat = jnp.concatenate([v.ravel() for v in
                                jax.tree_util.tree_leaves(gv)])
        if oracle is None:
            oracle = flat
        cos = float(jnp.dot(flat, oracle) /
                    (jnp.linalg.norm(flat) * jnp.linalg.norm(oracle)))
        results[name] = {
            "step_ms": round(dt_step * 1e3, 3),
            "rhs_evals_fwd": int(metrics["n_rhs_evals"]),
            "grad_cos_vs_oracle": round(cos, 6),
        }
        print(f"{name:28s} {results[name]}", flush=True)

    out = os.path.join(_REPO, "benchmarks", "sweep_results.json")
    with open(out, "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "results": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
