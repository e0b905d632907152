"""One-stop TPU perf probe for round-2 decisions (VERDICT items 4 & 6).

Measures, on the real chip:
  A. encoder-heads kernel vs XLA at batch 64 / 1024 / 4096 (fwd, fwd+bwd)
  B. batched solve: vmapped scan vs Pallas kernel vs interp_stride=2,
     and a lax.scan unroll sweep (latency attack on the sequential path)
  C. full flagship train step: kernel/stride combos at batch 64

Writes benchmarks/perf_probe.json and prints one JSON line per row.
Run:  python benchmarks/perf_probe.py
"""
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

import jax
import jax.numpy as jnp

ROWS = []


def timeit(fn, *args, n=30):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def row(section, name, **kw):
    r = {"section": section, "name": name, **kw}
    ROWS.append(r)
    print(json.dumps(r), flush=True)


def probe_encoder():
    from latentdiffeq import nn
    from latentdiffeq.ops.recurrent_pallas import pallas_goku_heads

    T, D = 50, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pe_z0 = nn.Recurrent.rnn(ks[0], D, (16, 16), nn.relu)
    pe_f = nn.Recurrent.lstm(ks[1], D, (16, 16))
    pe_b = nn.Recurrent.lstm(ks[2], D, (16, 16))

    def xla(xs):
        return nn.fused_goku_heads(pe_z0, pe_f, pe_b, xs)

    def pls(xs):
        return pallas_goku_heads(pe_z0, pe_f, pe_b, xs)

    def lossify(f):
        return lambda xs: sum(jnp.sum(o ** 2) for o in f(xs))

    for B in (64, 1024, 4096):
        xs = jax.random.normal(jax.random.PRNGKey(5), (B, T, D))
        for nm, f in (("xla", xla), ("pallas", pls)):
            fwd = timeit(f, xs)
            bwd = timeit(jax.grad(lossify(f)), xs)
            row("encoder_heads", nm, batch=B, fwd_ms=round(fwd, 3),
                fwdbwd_ms=round(bwd, 3))


def probe_solve():
    from latentdiffeq.ops.ode_pallas import pallas_solve_fixed_grid_batched
    from latentdiffeq.solve.fixed import solve_fixed_grid
    from latentdiffeq.solve.rk import Tsit5, rk_step

    def pend(u, p, t):
        return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])

    saveat = jnp.arange(50, dtype=jnp.float32) * 0.05
    tab = Tsit5().tableau

    def vmapped(u0s, ps, **kw):
        return jax.vmap(lambda u, p: solve_fixed_grid(
            pend, Tsit5(), u, p, saveat, **kw)[0])(u0s, ps)

    def pallas(u0s, ps):
        return pallas_solve_fixed_grid_batched(pend, Tsit5(), u0s, ps,
                                               saveat)[0]

    def unrolled(k):
        def run1(u0, p):
            def interval(y, span):
                ta, tb = span
                y1, _, _ = rk_step(pend, tab, y, p, ta, tb - ta,
                                   with_error=False)
                return y1, y1
            _, ys = jax.lax.scan(interval, u0, (saveat[:-1], saveat[1:]),
                                 unroll=k)
            return ys
        return lambda u0s, ps: jax.vmap(run1)(u0s, ps)

    for B in (64, 1024, 4096):
        u0s = jax.random.uniform(jax.random.PRNGKey(0), (B, 2),
                                 minval=-0.5, maxval=0.5)
        ps = jax.random.uniform(jax.random.PRNGKey(1), (B, 1),
                                minval=1.0, maxval=2.0)
        variants = [
            ("vmapped", lambda u, p: vmapped(u, p)),
            ("pallas", pallas),
            ("stride2", lambda u, p: vmapped(u, p, interp_stride=2)),
            ("unroll7", unrolled(7)),
            ("unroll49", unrolled(49)),
        ]
        for nm, f in variants:
            fwd = timeit(f, u0s, ps)
            bwd = timeit(jax.grad(lambda u, p: jnp.sum(f(u, p) ** 2),
                                  argnums=1), u0s, ps)
            row("solve", nm, batch=B, fwd_ms=round(fwd, 3),
                fwdbwd_ms=round(bwd, 3))


def probe_train_step():
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import optim
    from latentdiffeq.train.losses import loss_batch

    def build(mt, stride, unroll=1):
        diffeq = Pendulum(options=make_options(
            adaptive=False, substeps=1, interp_stride=stride,
            unroll=unroll))
        enc, dec = default_layers(jax.random.PRNGKey(0), mt, 784, diffeq)
        return LatentDiffEqModel.build(mt, enc, dec)

    opt = optim.adamw(1e-3, decay=1e-3)
    t = jnp.arange(50, dtype=jnp.float32) * 0.05

    def make_step(model):
        opt_state = opt.init(model)

        def step(model, opt_state, x, key):
            (loss, m), grads = jax.value_and_grad(
                lambda mm: loss_batch(mm, x, t, 0.5, variational=True,
                                      key=key), has_aux=True)(model)
            updates, opt_state = opt.update(grads, opt_state, model)
            return optim.apply_updates(model, updates), opt_state, loss

        return step, opt_state

    combos = [
        ("baseline", GOKUBasic(), 1, 1),
        ("pallas_enc", GOKUBasic(use_pallas_encoder=True), 1, 1),
        ("pallas_both", GOKUBasic(use_pallas_encoder=True,
                                  use_pallas_solver=True), 1, 1),
        ("stride2", GOKUBasic(), 2, 1),
        ("enc+stride2", GOKUBasic(use_pallas_encoder=True), 2, 1),
        ("unroll49", GOKUBasic(), 1, 49),
        ("stride2+unroll", GOKUBasic(), 2, 24),
    ]
    for B in (64, 4096):
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, 50, 784))
        for nm, mt, stride, unroll in combos:
            model = build(mt, stride, unroll)
            step, opt_state = make_step(model)
            ms = timeit(step, model, opt_state, x, jax.random.PRNGKey(2),
                        n=(30 if B == 64 else 10))
            row("train_step", nm, batch=B, step_ms=round(ms, 3),
                samples_per_s=round(B / ms * 1e3))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    sections = [a for a in sys.argv[1:] if not a.startswith("-")]
    out_path = os.path.join(_REPO, "benchmarks", "perf_probe.json")
    if sections and os.path.exists(out_path):
        with open(out_path) as f:        # partial re-run: keep other rows
            ROWS.extend(r for r in json.load(f)
                        if r["section"] not in sections)
    if not sections or "encoder_heads" in sections:
        probe_encoder()
    if not sections or "solve" in sections:
        probe_solve()
    if not sections or "train_step" in sections:
        probe_train_step()
    with open(out_path, "w") as f:
        json.dump(ROWS, f, indent=2)


if __name__ == "__main__":
    main()
