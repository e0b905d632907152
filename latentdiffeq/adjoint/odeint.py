"""Functional ODE integration with selectable gradient mode.

``odeint`` is the differentiable core every higher layer (GOKU diffeq layer,
NeuralODE, data generation) calls. It returns ``(ys, success, stats)`` and
dispatches on ``sensealg`` (see adjoint/modes.py), replacing the reference's
``solve(...; sensealg=...)`` (src/models/GOKU.jl:121).

Gradient support: cotangents flow to ``u0`` and ``p``. The save grid
``saveat`` is treated as non-differentiable (the training loops always use a
constant grid, reference: model_train.jl:181).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..solve.adaptive import AdaptiveConfig, solve_adaptive
from ..solve.fixed import solve_fixed_grid
from ..solve.rk import AbstractSolver, rk_step
from .modes import (AbstractSensealg, BacksolveAdjoint, InterpolatingAdjoint,
                    Unrolled)

__all__ = ["odeint", "SolveOptions"]


@dataclasses.dataclass(frozen=True)
class SolveOptions:
    """Static solve configuration (hashable; lives inside model pytrees as
    metadata the way the reference stores ``solver``/``kwargs`` in its diffeq
    structs, pendulum.jl:4-10)."""

    adaptive: bool = True
    substeps: int = 1                     # fixed-grid steps per saveat interval
    adaptive_cfg: AdaptiveConfig = AdaptiveConfig()
    # >1: one method step per `interp_stride` grid intervals, interior save
    # points from dense output (~stride x fewer RHS evals; fixed-grid only)
    interp_stride: int = 1
    # >1: unroll the fixed-grid scan body this many iterations per loop
    # step — same trajectory, shorter sequential issue chain (latency lever
    # at small batch; benchmarks/perf_probe.py section B)
    unroll: int = 1

    def replace(self, **kw) -> "SolveOptions":
        return dataclasses.replace(self, **kw)


def _forward(f, solver, u0, p, saveat, options: SolveOptions,
             checkpoint: bool = False):
    if options.adaptive:
        if not solver.is_adaptive_capable:
            return solve_fixed_grid(f, solver, u0, p, saveat,
                                    substeps=options.substeps,
                                    checkpoint=checkpoint,
                                    unroll=options.unroll)
        return solve_adaptive(f, solver, u0, p, saveat, options.adaptive_cfg)
    return solve_fixed_grid(f, solver, u0, p, saveat,
                            substeps=options.substeps, checkpoint=checkpoint,
                            interp_stride=options.interp_stride,
                            unroll=options.unroll)


def _fixed_interval_map(f, solver, substeps):
    """y(t_lo) -> y(t_hi) with `substeps` fixed steps. Used by the adjoint
    backward passes to re-solve one saveat interval."""
    tab = solver.tableau

    def run(y, p, t_lo, t_hi):
        dt = (t_hi - t_lo) / substeps
        for j in range(substeps):
            y, _, _ = rk_step(f, tab, y, p, t_lo + j * dt, dt,
                              with_error=False)
        return y

    return run


def _interval_map(f, solver, sensealg, fallback_substeps=None):
    """Interval re-solve used inside adjoint backward passes: adaptive
    (error-controlled, VERDICT round-1 item 8) when the sensealg asks for
    it and the solver has an embedded error; fixed substeps otherwise."""
    substeps = (fallback_substeps if fallback_substeps is not None
                else sensealg.bwd_substeps)
    if not (getattr(sensealg, "adaptive", False)
            and solver.is_adaptive_capable):
        return _fixed_interval_map(f, solver, substeps)
    cfg = AdaptiveConfig(rtol=sensealg.bwd_rtol, atol=sensealg.bwd_atol,
                         max_steps=sensealg.bwd_max_steps)

    def run(y, p, t_lo, t_hi):
        ys, success, _ = solve_adaptive(f, solver, y, p,
                                        jnp.stack([t_lo, t_hi]), cfg)
        # budget exhaustion degrades to NaN like a failed forward; the
        # ensemble NaN-fill semantics then isolate the sample
        return jnp.where(success, ys[-1], jnp.nan)

    return run


# ---------------------------------------------------------------------------
# InterpolatingAdjoint: checkpoint at saveat, recompute + vjp per interval
# ---------------------------------------------------------------------------

def _make_interpolating_odeint(f, solver, options, sensealg):
    interval_map = _interval_map(
        f, solver, sensealg,
        fallback_substeps=(options.substeps if not options.adaptive
                           else None))

    @jax.custom_vjp
    def _odeint(u0, p, saveat):
        return _forward(f, solver, u0, p, saveat, options)

    def _fwd(u0, p, saveat):
        out = _forward(f, solver, u0, p, saveat, options)
        ys, _, _ = out
        return out, (ys, p, saveat)

    def _bwd(res, ct):
        ys, p, saveat = res
        ys_bar = ct[0]

        zero_p = jax.tree_util.tree_map(jnp.zeros_like, p)

        def body(carry, xs):
            a, dp = carry
            t_lo, t_hi, y_lo, g_lo = xs
            _, vjp_fn = jax.vjp(
                lambda yy, pp: interval_map(yy, pp, t_lo, t_hi), y_lo, p)
            dy_lo, dp_i = vjp_fn(a)
            a_new = dy_lo + g_lo
            dp_new = jax.tree_util.tree_map(jnp.add, dp, dp_i)
            return (a_new, dp_new), None

        xs = (saveat[:-1], saveat[1:], ys[:-1], ys_bar[:-1])
        (a0, dp), _ = jax.lax.scan(body, (ys_bar[-1], zero_p), xs,
                                   reverse=True)
        return a0, dp, jnp.zeros_like(saveat)

    _odeint.defvjp(_fwd, _bwd)
    return _odeint


# ---------------------------------------------------------------------------
# BacksolveAdjoint: continuous adjoint ODE integrated backward in time
# ---------------------------------------------------------------------------

def _make_backsolve_odeint(f, solver, options, sensealg):
    bwd_substeps = sensealg.bwd_substeps
    tab = solver.tableau

    @jax.custom_vjp
    def _odeint(u0, p, saveat):
        return _forward(f, solver, u0, p, saveat, options)

    def _fwd(u0, p, saveat):
        out = _forward(f, solver, u0, p, saveat, options)
        ys, _, _ = out
        return out, (ys, p, saveat)

    def _bwd(res, ct):
        ys, p, saveat = res
        ys_bar = ct[0]

        zero_p = jax.tree_util.tree_map(jnp.zeros_like, p)
        aug0 = (ys[-1], ys_bar[-1], zero_p)
        flat0, unravel = ravel_pytree(aug0)

        def body(carry, xs):
            aug_flat = carry
            t_lo, t_hi, y_lo_stored, g_lo = xs

            # Augmented dynamics in s = t_hi - t (integrating s: 0 -> h):
            #   dy/ds = -f(y, p, t),  da/ds = +a^T df/dy,  dap/ds = +a^T df/dp
            def aug_dyn(aflat, _unused_p, s):
                y_, a_, _ = unravel(aflat)
                t = t_hi - s
                _, vjp_fn = jax.vjp(lambda yy, pp: f(yy, pp, t), y_, p)
                ay_bar, ap_bar = vjp_fn(a_)
                d, _ = ravel_pytree((-f(y_, p, t), ay_bar, ap_bar))
                return d

            h = t_hi - t_lo
            if getattr(sensealg, "adaptive", False) \
                    and solver.is_adaptive_capable:
                cfg = AdaptiveConfig(rtol=sensealg.bwd_rtol,
                                     atol=sensealg.bwd_atol,
                                     max_steps=sensealg.bwd_max_steps)
                aug_ys, ok, _ = solve_adaptive(
                    aug_dyn, solver, aug_flat, None,
                    jnp.stack([jnp.zeros_like(h), h]), cfg)
                a_end = jnp.where(ok, aug_ys[-1], jnp.nan)
            else:
                ds = h / bwd_substeps
                a_end = aug_flat
                for j in range(bwd_substeps):
                    a_end, _, _ = rk_step(aug_dyn, tab, a_end, None,
                                          j * ds, ds, with_error=False)
            y1, a1, ap1 = unravel(a_end)
            a1 = a1 + g_lo
            if sensealg.checkpointing:
                y1 = y_lo_stored
            out, _ = ravel_pytree((y1, a1, ap1))
            return out, None

        xs = (saveat[:-1], saveat[1:], ys[:-1], ys_bar[:-1])
        final, _ = jax.lax.scan(body, flat0, xs, reverse=True)
        _, a0, ap = unravel(final)
        return a0, ap, jnp.zeros_like(saveat)

    _odeint.defvjp(_fwd, _bwd)
    return _odeint


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def odeint(f: Callable, solver: AbstractSolver, u0, p, saveat,
           options: SolveOptions = SolveOptions(),
           sensealg: AbstractSensealg = Unrolled()):
    """Integrate du/dt = f(u, p, t), emitting states at ``saveat``.

    Returns ``(ys, success, stats)``. Differentiable wrt ``u0`` and ``p``
    according to ``sensealg``; vmap over (u0, p) for ensembles.
    """
    if isinstance(sensealg, Unrolled):
        return _forward(f, solver, u0, p, saveat, options,
                        checkpoint=sensealg.checkpoint)
    if isinstance(sensealg, InterpolatingAdjoint):
        if not options.adaptive:
            # Exact: checkpoint each interval; backward rematerializes.
            return _forward(f, solver, u0, p, saveat, options,
                            checkpoint=True)
        return _make_interpolating_odeint(f, solver, options, sensealg)(
            u0, p, saveat)
    if isinstance(sensealg, BacksolveAdjoint):
        return _make_backsolve_odeint(f, solver, options, sensealg)(
            u0, p, saveat)
    raise ValueError(f"unknown sensealg {sensealg}")
