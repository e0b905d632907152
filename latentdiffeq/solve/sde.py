"""SDE solvers: Euler–Maruyama and stochastic Heun, fixed grid.

Covers the reference's ``SDEProblem`` capability (the additive-noise
stochastic pendulum, reference: examples/pendulum_friction-less/pendulum.jl:96-140,
solved with ``SOSRI()``). For the additive-noise case that workload needs,
stochastic Heun is strong order 1.0 / weak order 2.0; Euler–Maruyama is the
general diagonal-noise fallback. Noise is pre-sampled as a (intervals,
substeps, dim) normal tensor so the scan body is deterministic and
differentiable (pathwise / reparameterized gradients).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["EulerMaruyama", "StochasticHeun", "solve_sde_fixed_grid",
           "AbstractSDESolver"]


@dataclasses.dataclass(frozen=True)
class AbstractSDESolver:
    pass


@dataclasses.dataclass(frozen=True)
class EulerMaruyama(AbstractSDESolver):
    """y' = y + f dt + g dW. Strong order 0.5 (1.0 for additive noise)."""


@dataclasses.dataclass(frozen=True)
class StochasticHeun(AbstractSDESolver):
    """Drift-Heun with additive/diagonal noise. For additive noise: strong
    order 1.0, weak order 2.0 — the role SOSRI plays for the reference's
    additive-noise pendulum (pendulum.jl:103)."""


def _em_step(f, g, y, p, t, dt, dw):
    return y + dt * f(y, p, t) + g(y, p, t) * dw


def _heun_step(f, g, y, p, t, dt, dw):
    gy = g(y, p, t)
    f1 = f(y, p, t)
    y_pred = y + dt * f1 + gy * dw
    f2 = f(y_pred, p, t + dt)
    g2 = g(y_pred, p, t + dt)
    return y + 0.5 * dt * (f1 + f2) + 0.5 * (gy + g2) * dw


def solve_sde_fixed_grid(f: Callable, g: Callable, solver: AbstractSDESolver,
                         u0, p, saveat, key, *, substeps: int = 1,
                         checkpoint: bool = False):
    """Integrate the SDE across ``saveat`` (T,). Returns (ys, success, stats).

    ``key``: JAX PRNG key driving the Brownian increments. The same key gives
    the same path at any ``substeps`` refinement of the same grid only in
    distribution (increments are resampled, not a Brownian bridge).
    """
    if isinstance(solver, StochasticHeun):
        step = _heun_step
        evals_per = 2
    elif isinstance(solver, EulerMaruyama):
        step = _em_step
        evals_per = 1
    else:
        raise ValueError(f"unknown SDE solver {solver}")

    n = saveat.shape[0] - 1
    dts = (saveat[1:] - saveat[:-1]) / substeps
    dws = jax.random.normal(key, (n, substeps) + u0.shape, u0.dtype)

    def interval(y, xs):
        ta, dt, dw = xs
        sqdt = jnp.sqrt(dt)
        for j in range(substeps):
            y = step(f, g, y, p, ta + j * dt, dt, sqdt * dw[j])
        return y, y

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, ys_tail = jax.lax.scan(interval, u0, (saveat[:-1], dts, dws))
    ys = jnp.concatenate([u0[None], ys_tail], axis=0)
    success = jnp.all(jnp.isfinite(ys))
    stats = {
        "n_rhs_evals": jnp.asarray(n * substeps * evals_per, jnp.int32),
        "n_accepted": jnp.asarray(n * substeps, jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
    }
    return ys, success, stats
