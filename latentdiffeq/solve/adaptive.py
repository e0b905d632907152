"""Adaptive ODE solving: PI-controlled embedded RK pairs, bounded scan.

Replaces OrdinaryDiffEq's adaptive Tsit5 with dense output (the reference's
solver, pendulum.jl:11; solve with ``saveat=t`` at GOKU.jl:121).

TPU design notes (SURVEY.md §7 "hard parts"):
- The step loop is a **bounded `lax.scan`** of ``max_steps`` iterations with
  masked no-op steps after completion, not a `while_loop`. This keeps the
  solve reverse-differentiable (discretize-then-optimize through the adaptive
  steps — the role ForwardDiffSensitivity plays in the reference) and makes
  `vmap` trivial: each batch element steps with its own dt sequence, in
  lockstep over the same static iteration count.
- ``saveat`` points are emitted by **dense output**: after each accepted step
  the continuous extension is evaluated at *all* save times that fall inside
  the step, vectorized over the whole (T,) grid — no dynamic indexing.
- Failure (dt underflow, non-finite state, step budget exhausted) lowers the
  ``success`` flag; the ensemble wrapper NaN-fills such trajectories,
  matching ``sol.retcode != :Success`` handling (reference: GOKU.jl:113-114).

The PI step-size controller follows Hairer, Nørsett & Wanner (DOPRI5.f):
``dt_new = dt / clip(err^expo1 / facold^beta / safety, 1/max_growth, 1/min_shrink)``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .rk import AbstractSolver, rk_step, interpolate_dense

__all__ = ["solve_adaptive", "AdaptiveConfig"]


@dataclasses.dataclass(frozen=True)
class AdaptiveConfig:
    """Adaptive-solve configuration.

    COST NOTE: the bounded-scan design makes the compute cost
    ``max_steps``-bound, not difficulty-bound — every trajectory pays for
    ``max_steps`` masked iterations. Tune it per workload: run once, read
    ``stats["n_accepted"] + stats["n_rejected"]`` (the actual attempts),
    and set ``max_steps ~ 1.5x`` that. The flagship pendulum grid needs
    ~50-80 attempts at default tolerances, so ``max_steps=128`` halves the
    adaptive-path cost vs the safe default of 256; solves that hit the
    budget lower their ``success`` flag (NaN-filled in ensembles), so an
    undersized budget is loud, not silent.
    """
    rtol: float = 1e-3          # OrdinaryDiffEq defaults (reltol=1e-3,
    atol: float = 1e-6          # abstol=1e-6), which the reference inherits.
    max_steps: int = 256
    safety: float = 0.9
    max_growth: float = 10.0
    min_shrink: float = 0.2
    beta: Optional[float] = None    # PI coefficient; default 0.2/order
    dt0: Optional[float] = None     # initial dt; default: Hairer's hinit
    dtmin_frac: float = 1e-7        # dtmin = dtmin_frac * span
    force_dtmin_fail: bool = True
    # Clamp steps so they land exactly ON each save point (DiffEq's tstops
    # behavior) instead of stepping over and interpolating. Slightly more
    # steps, zero interpolation error.
    step_to_saveat: bool = False
    # Difficulty-bound stepping: run the SAME masked body in chunk_size
    # pieces under an outer `lax.while_loop` that exits as soon as every
    # (vmapped) trajectory is done/failed — cost tracks the actual step
    # count instead of always paying max_steps. Composes with inference
    # and the continuous adjoints (InterpolatingAdjoint/BacksolveAdjoint,
    # whose backward never differentiates the forward loop); reverse-mode
    # through the loop itself (Unrolled sensealg) is not possible — JAX
    # raises its standard while_loop error. The step budget rounds UP to a
    # multiple of chunk_size.
    early_exit: bool = False
    chunk_size: int = 32


def _err_norm(err, y0, y1, rtol, atol):
    sc = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = err / sc
    return jnp.sqrt(jnp.mean(r * r))


def _hairer_hinit(f, y0, p, t0, f0, span, order, rtol, atol):
    """Hairer's automatic initial step size (HINIT in DOPRI5.f)."""
    sc = atol + rtol * jnp.abs(y0)
    d0 = jnp.sqrt(jnp.mean((y0 / sc) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / sc) ** 2))
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, jnp.asarray(1e-6, y0.dtype), 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, span)
    y1 = y0 + h0 * f0
    f1 = f(y1, p, t0 + h0)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / sc) ** 2)) / h0
    m = jnp.maximum(d1, d2)
    h1 = jnp.where(
        m <= 1e-15,
        jnp.maximum(jnp.asarray(1e-6, y0.dtype), h0 * 1e-3),
        (0.01 / m) ** (1.0 / order),
    )
    return jnp.minimum(jnp.minimum(100.0 * h0, h1), span)


def solve_adaptive(f: Callable, solver: AbstractSolver, u0, p, saveat,
                   cfg: AdaptiveConfig = AdaptiveConfig()):
    """Integrate over ``[saveat[0], saveat[-1]]`` adaptively; emit ``saveat``.

    Returns ``(ys, success, stats)``, ``ys``: (T, dim).
    """
    tab = solver.tableau
    if tab.b_err is None:
        raise ValueError(f"{solver} has no embedded error estimate; "
                         "use solve_fixed_grid instead.")
    if not tab.fsal:
        raise NotImplementedError("adaptive stepping currently assumes FSAL")

    dtype = u0.dtype
    saveat = saveat.astype(dtype)
    t0, t_end = saveat[0], saveat[-1]
    span = t_end - t0
    order = tab.order
    beta = cfg.beta if cfg.beta is not None else 0.2 / order
    expo1 = 1.0 / order - 0.75 * beta
    dtmin = cfg.dtmin_frac * span
    tiny = 1e-6 * span

    f0 = f(u0, p, t0)
    n_hinit = 0
    if cfg.dt0 is None:
        dt0 = jax.lax.stop_gradient(
            _hairer_hinit(f, u0, p, t0, f0, span, order, cfg.rtol, cfg.atol))
        n_hinit = 1
    else:
        dt0 = jnp.asarray(cfg.dt0, dtype)

    T = saveat.shape[0]
    ys0 = jnp.where((saveat <= t0 + tiny)[:, None],
                    u0[None, :], jnp.full((T,) + u0.shape, jnp.nan, dtype))

    carry0 = dict(
        t=t0, y=u0, f0=f0, dt=dt0,
        facold=jnp.asarray(1e-4, dtype),
        last_rejected=jnp.asarray(False),
        done=jnp.asarray(False), fail=jnp.asarray(False),
        ys=ys0,
        n_acc=jnp.asarray(0, jnp.int32), n_rej=jnp.asarray(0, jnp.int32),
    )

    n_stage_evals = len(tab.b) - 1  # FSAL: k1 carried over

    def body(c, _):
        active = ~(c["done"] | c["fail"])
        remaining = t_end - c["t"]
        dt = jnp.minimum(c["dt"], remaining)
        if cfg.step_to_saveat:
            # distance to the next save point strictly ahead of t
            ahead = jnp.where(saveat > c["t"] + tiny, saveat - c["t"],
                              jnp.inf)
            dt = jnp.minimum(dt, jnp.min(ahead))
        dt = jnp.maximum(dt, jnp.asarray(0.0, dtype))

        y1, err, ks = rk_step(f, tab, c["y"], p, c["t"], dt, f0=c["f0"],
                              with_error=True)
        # The step-size controller is control flow, not a differentiable
        # quantity: gradients flow through the *accepted stage values* only
        # (discretize-then-optimize with the step sequence treated as fixed,
        # like ForwardDiffSensitivity over the solver's chosen steps).
        sg = jax.lax.stop_gradient
        en = _err_norm(sg(err), sg(c["y"]), sg(y1), cfg.rtol, cfg.atol)
        finite = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(en)
        accept = (en <= 1.0) & finite

        # --- PI controller (Hairer DOPRI5) ---
        en_safe = jnp.maximum(en, jnp.asarray(1e-10, dtype))
        fac11 = en_safe ** expo1
        fac = fac11 / (c["facold"] ** beta)
        fac = jnp.clip(fac / cfg.safety, 1.0 / cfg.max_growth,
                       1.0 / cfg.min_shrink)
        dt_acc = dt / fac
        if cfg.step_to_saveat:
            # A step truncated onto a save point must not shrink future
            # steps (Hairer's tstops behavior: keep the working h).
            dt_acc = jnp.where(dt < c["dt"] - tiny,
                               jnp.maximum(dt_acc, c["dt"]), dt_acc)
        dt_acc = jnp.where(c["last_rejected"], jnp.minimum(dt_acc, dt), dt_acc)
        dt_rej = dt / jnp.minimum(1.0 / cfg.min_shrink, fac11 / cfg.safety)
        dt_rej = jnp.where(jnp.isfinite(dt_rej), dt_rej,
                           dt * cfg.min_shrink)
        dt_next = jnp.where(accept, dt_acc, dt_rej)

        step_ok = accept & active
        t_new = c["t"] + dt
        at_end = t_new >= t_end - tiny

        # --- dense output over the whole saveat grid ---
        mask = (saveat > c["t"]) & ((saveat <= t_new + tiny) | at_end)
        dt_div = jnp.maximum(dt, tiny)
        theta = jnp.clip((saveat - c["t"]) / dt_div, 0.0, 1.0)
        yint = interpolate_dense(tab, c["y"], y1, ks, dt, theta)
        ys = jnp.where((mask & step_ok)[:, None], yint, c["ys"])

        new = dict(
            t=jnp.where(step_ok, t_new, c["t"]),
            y=jnp.where(step_ok, y1, c["y"]),
            f0=jnp.where(step_ok, ks[-1], c["f0"]),
            dt=jnp.where(active, dt_next, c["dt"]),
            facold=jnp.where(step_ok, jnp.maximum(en, 1e-4), c["facold"]),
            last_rejected=jnp.where(active, ~accept, c["last_rejected"]),
            done=c["done"] | (step_ok & at_end),
            fail=c["fail"] | (active & ~accept &
                              ((dt_next < dtmin) if cfg.force_dtmin_fail
                               else jnp.asarray(False)))
                 | (active & ~finite & (dt_next < dtmin)),
            ys=ys,
            n_acc=c["n_acc"] + step_ok.astype(jnp.int32),
            n_rej=c["n_rej"] + (active & ~accept).astype(jnp.int32),
        )
        return new, None

    if cfg.early_exit:
        # Outer while_loop over fixed-size scan chunks. Under vmap the
        # condition batches to `any(lane conds)` with per-lane carry
        # selects, so the loop runs exactly until the LAST trajectory of
        # the batch finishes — difficulty-bound, not budget-bound.
        def w_cond(state):
            c, n = state
            return jnp.any(~(c["done"] | c["fail"])) & (n < cfg.max_steps)

        def w_body(state):
            c, n = state
            c, _ = jax.lax.scan(body, c, None, length=cfg.chunk_size)
            return c, n + cfg.chunk_size

        final, _ = jax.lax.while_loop(
            w_cond, w_body, (carry0, jnp.asarray(0, jnp.int32)))
    else:
        final, _ = jax.lax.scan(body, carry0, None, length=cfg.max_steps)

    fail = final["fail"] | ~final["done"]
    success = ~fail & jnp.all(jnp.isfinite(final["ys"]))
    attempts = final["n_acc"] + final["n_rej"]
    stats = {
        "n_rhs_evals": 1 + n_hinit + attempts * n_stage_evals,
        "n_accepted": final["n_acc"],
        "n_rejected": final["n_rej"],
    }
    return final["ys"], success, stats
