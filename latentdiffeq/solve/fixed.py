"""Fixed-grid ODE solving: one `lax.scan` over the saveat grid.

The workhorse for training. The reference's parity workload solves on the
``saveat = t`` grid with Tsit5 (src/models/GOKU.jl:121,
examples/pendulum_friction-less/model_train.jl:181); on TPU a fixed-grid
scan is fully differentiable (discretize-then-optimize — the role
``ForwardDiffSensitivity`` plays in the reference, pendulum.jl:11), has
static shapes, and keeps the whole solve on-chip.

``checkpoint=True`` wraps each grid interval in `jax.checkpoint`, so the
backward pass rematerializes stage values instead of storing them —
memory O(T) instead of O(T * substeps * stages).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .rk import AbstractSolver, rk_step

__all__ = ["solve_fixed_grid"]


def solve_fixed_grid(f: Callable, solver: AbstractSolver, u0, p, saveat,
                     *, substeps: int = 1, checkpoint: bool = False):
    """Integrate du/dt = f(u, p, t) across ``saveat`` (T,) with ``substeps``
    method steps per grid interval.

    Returns ``(ys, success, stats)`` with ``ys`` of shape (T, *u0.shape).
    """
    tab = solver.tableau
    n_stage_evals = max(i for i in range(len(tab.b)) if tab.b[i] != 0.0) + 1

    def interval(y, span):
        ta, tb = span
        dt = (tb - ta) / substeps
        if substeps <= 4:
            for j in range(substeps):
                y, _, _ = rk_step(f, tab, y, p, ta + j * dt, dt,
                                  with_error=False)
        else:
            def sub(j, yy):
                y1, _, _ = rk_step(f, tab, yy, p, ta + j * dt, dt,
                                   with_error=False)
                return y1
            y = jax.lax.fori_loop(0, substeps, sub, y)
        return y, y

    if checkpoint:
        interval = jax.checkpoint(interval)

    spans = (saveat[:-1], saveat[1:])
    _, ys_tail = jax.lax.scan(interval, u0, spans)
    ys = jnp.concatenate([u0[None], ys_tail], axis=0)

    success = jnp.all(jnp.isfinite(ys))
    n = saveat.shape[0] - 1
    stats = {
        "n_rhs_evals": jnp.asarray(n * substeps * n_stage_evals, jnp.int32),
        "n_accepted": jnp.asarray(n * substeps, jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
    }
    return ys, success, stats
