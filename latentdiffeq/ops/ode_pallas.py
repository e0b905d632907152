"""Pallas TPU kernel: entire batched fixed-grid ODE solve in ONE kernel.

The BASELINE.json north star calls for the "vmapped batched RHS fused into
one Pallas batched-matmul kernel per stage". This kernel goes further: the
whole solve — every grid interval, every RK stage, the full batch — runs
inside a single `pallas_call`, with the batched state (B, dim) resident in
VMEM for the entire integration. No per-step HLO loop overhead, no
HBM round-trips between stages; each stage is a handful of VPU ops (or MXU
matmuls for neural vector fields) on the in-register batch.

Gradient support: `jax.custom_vjp` whose backward rematerializes through
the pure-JAX `solve_fixed_grid` path (exact same discretization, so the
gradients are identical to the unrolled reference; the forward pays zero
tape cost).

Falls back to interpreter mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solve.rk import AbstractSolver, n_solution_stages

__all__ = ["pallas_solve_fixed_grid_batched"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _batched_rk_step(f, tab, y, p, t, dt):
    """One fixed RK step on the whole batch. y: (B, dim); p: (B, pdim)."""
    s = n_solution_stages(tab)
    fb = jax.vmap(f, in_axes=(0, 0, None))
    ks = []
    for i in range(s):
        yi = y
        for j, aij in enumerate(tab.a[i]):
            if aij != 0.0:
                yi = yi + (dt * aij) * ks[j]
        ks.append(fb(yi, p, t + tab.c[i] * dt))
    y1 = y
    for bi, k in zip(tab.b, ks):
        if bi != 0.0:
            y1 = y1 + (dt * bi) * k
    return y1


def _solve_kernel(f, tab, substeps, T, saveat_ref, u0_ref, p_ref, out_ref):
    y = u0_ref[:]                     # (B, dim) stays in VMEM throughout
    p = p_ref[:]
    out_ref[pl.ds(0, 1)] = y[None]

    def body(i, y):
        ta = saveat_ref[i]
        tb = saveat_ref[i + 1]
        dt = (tb - ta) / substeps
        for j in range(substeps):
            y = _batched_rk_step(f, tab, y, p, ta + j * dt, dt)
        out_ref[pl.ds(i + 1, 1)] = y[None]
        return y

    jax.lax.fori_loop(0, T - 1, body, y)


def _batch_tile(B: int, T: int, dim: int, pdim: int, itemsize: int,
                budget: int = 6 * 1024 * 1024) -> int:
    """Largest power-of-two batch tile keeping the (T, TB, dim) trajectory
    block within the VMEM budget — the kernel grids over batch tiles, so
    large-batch solves stay in-kernel (VERDICT round-1 item 4).

    VMEM accounting uses the LANE-PADDED footprint: the trailing dim is
    tiled to 128 lanes, so a dim-2 state costs 128 lanes per row in VMEM
    (measured: the un-padded estimate under-counted 64x and Mosaic's
    scoped allocation blew past its limit at batch 4096)."""
    lanes = -(-max(dim, dim + pdim) // 128) * 128
    tb = 8
    while tb * 2 <= B and T * (tb * 2) * lanes * itemsize <= budget:
        tb *= 2
    return tb


def _pallas_forward(f, solver, substeps, u0s, ps, saveat, interpret):
    B, dim = u0s.shape
    pdim = ps.shape[1]
    T = saveat.shape[0]
    tab = solver.tableau

    tb = _batch_tile(B, T, dim, pdim, u0s.dtype.itemsize)
    n_tiles = -(-B // tb)
    b_pad = n_tiles * tb
    if b_pad != B:
        # pad with the first row (guaranteed-finite trajectories; padding
        # rows are sliced off below)
        u0s = jnp.concatenate(
            [u0s, jnp.tile(u0s[:1], (b_pad - B, 1))], axis=0)
        ps = jnp.concatenate([ps, jnp.tile(ps[:1], (b_pad - B, 1))], axis=0)

    kernel = functools.partial(_solve_kernel, f, tab, substeps, T)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((T, b_pad, dim), u0s.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # saveat (T,)
            pl.BlockSpec((tb, dim), lambda i: (i, 0)),      # u0s tile
            pl.BlockSpec((tb, pdim), lambda i: (i, 0)),     # ps tile
        ],
        out_specs=pl.BlockSpec((T, tb, dim), lambda i: (0, i, 0)),
        # independent batch tiles; headroom over the 16MB default scoped-
        # VMEM limit (see recurrent_pallas.py — Mosaic scoped allocations
        # run well past the raw block size)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(saveat, u0s, ps)
    return jnp.swapaxes(out, 0, 1)[:B]                      # (B, T, dim)


def pallas_solve_fixed_grid_batched(f: Callable, solver: AbstractSolver,
                                    u0s, ps, saveat, *, substeps: int = 1,
                                    interpret: bool | None = None):
    """Batched fixed-grid solve, one Pallas kernel.

    ``u0s``: (B, dim); ``ps``: (B, pdim) — array parameters only (the
    mechanistic GOKU case). Returns ``(ys, success, stats)`` matching the
    vmapped `solve_fixed_grid` exactly. Cotangents w.r.t. ``saveat`` are
    not propagated (returned zero); differentiate the pure-JAX path for
    time-grid learning.
    """
    if interpret is None:
        interpret = not _on_tpu()

    tab = solver.tableau
    n_stage = n_solution_stages(tab)
    T = saveat.shape[0]

    @jax.custom_vjp
    def _run(u0s, ps, saveat):
        return _pallas_forward(f, solver, substeps, u0s, ps, saveat,
                               interpret)

    def _fwd(u0s, ps, saveat):
        return _run(u0s, ps, saveat), (u0s, ps, saveat)

    def _bwd(res, g):
        u0s, ps, saveat = res

        # Rematerialize through the pure-JAX path — identical
        # discretization, exact gradients, no stored tape in the forward.
        def ref(u0s_, ps_):
            from ..solve.fixed import solve_fixed_grid
            ys, _, _ = jax.vmap(
                lambda u0, p: solve_fixed_grid(f, solver, u0, p, saveat,
                                               substeps=substeps)
            )(u0s_, ps_)
            return ys

        _, vjp_fn = jax.vjp(ref, u0s, ps)
        du0, dp = vjp_fn(g)
        return du0, dp, jnp.zeros_like(saveat)

    _run.defvjp(_fwd, _bwd)

    ys = _run(u0s, ps, saveat)
    success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
    stats = {
        "n_rhs_evals": jnp.asarray(
            u0s.shape[0] * (T - 1) * substeps * n_stage, jnp.int32),
        "n_accepted": jnp.asarray(u0s.shape[0] * (T - 1) * substeps,
                                  jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
    }
    return ys, success, stats
