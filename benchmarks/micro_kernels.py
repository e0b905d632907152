"""Micro-benchmarks: XLA vs Pallas implementations of the hot paths.

Times forward and forward+backward of
  1. GOKU encoder heads: 3 separate scans / 1 fused scan / 1 Pallas kernel
  2. batched fixed-grid Tsit5 pendulum solve: vmapped scan / Pallas kernel
on the parity-workload shapes (B=64, T=50, D=32; solve T=50, dim=2).

Usage: python benchmarks/micro_kernels.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from latentdiffeq import nn
    from latentdiffeq.ops.recurrent_pallas import pallas_goku_heads
    from latentdiffeq.ops.ode_pallas import pallas_solve_fixed_grid_batched
    from latentdiffeq.solve.fixed import solve_fixed_grid
    from latentdiffeq.solve.rk import Tsit5

    B, T, D = 64, 50, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pe_z0 = nn.Recurrent.rnn(ks[0], D, (16, 16), nn.relu)
    pe_f = nn.Recurrent.lstm(ks[1], D, (16, 16))
    pe_b = nn.Recurrent.lstm(ks[2], D, (16, 16))
    xs = jax.random.normal(jax.random.PRNGKey(5), (B, T, D))

    def separate(xs):
        z0 = pe_z0(xs, reverse=True)
        th = jnp.concatenate([pe_f(xs), pe_b(xs, reverse=True)], axis=-1)
        return z0, th

    def fused(xs):
        return nn.fused_goku_heads(pe_z0, pe_f, pe_b, xs)

    def pallas(xs):
        return pallas_goku_heads(pe_z0, pe_f, pe_b, xs)

    def mkloss(f):
        def loss(xs):
            z0, th = f(xs)
            return jnp.sum(z0 ** 2) + jnp.sum(th ** 2)
        return loss

    print(f"platform: {jax.devices()[0].platform}")
    print("== GOKU encoder heads (B=64, T=50, D=32), ms ==")
    for name, f in [("separate", separate), ("fused", fused),
                    ("pallas", pallas)]:
        fwd = timeit(jax.jit(f), xs)
        bwd = timeit(jax.jit(jax.grad(mkloss(f))), xs)
        print(f"  {name:10s} fwd {fwd:7.3f}   fwd+bwd {bwd:7.3f}",
              flush=True)

    # --- ODE solve ---
    def pend(u, p, t):
        return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])

    u0s = jax.random.uniform(jax.random.PRNGKey(0), (B, 2), minval=-1.0,
                             maxval=1.0)
    ps = jax.random.uniform(jax.random.PRNGKey(1), (B, 1), minval=1.0,
                            maxval=2.0)
    saveat = jnp.arange(T, dtype=jnp.float32) * 0.05

    def vmapped(u0s, ps):
        ys, _, _ = jax.vmap(
            lambda u, p: solve_fixed_grid(pend, Tsit5(), u, p, saveat))(
                u0s, ps)
        return ys

    def pallas_solve(u0s, ps):
        ys, _, _ = pallas_solve_fixed_grid_batched(pend, Tsit5(), u0s, ps,
                                                   saveat)
        return ys

    def mkloss2(f):
        return lambda u, p: jnp.sum(f(u, p) ** 2)

    print("== batched Tsit5 pendulum solve (B=64, T=50), ms ==")
    for name, f in [("vmap-scan", vmapped), ("pallas", pallas_solve)]:
        fwd = timeit(jax.jit(f), u0s, ps)
        bwd = timeit(jax.jit(jax.grad(mkloss2(f), argnums=1)), u0s, ps)
        print(f"  {name:10s} fwd {fwd:7.3f}   fwd+bwd {bwd:7.3f}",
              flush=True)


if __name__ == "__main__":
    main()
