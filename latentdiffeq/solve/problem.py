"""ODE/SDE problem containers.

TPU-native equivalents of DifferentialEquations.jl's ``ODEProblem`` /
``SDEProblem`` as consumed by the reference (reference:
examples/pendulum_friction-less/pendulum.jl:30,131; src/models/GOKU.jl:105-121).

A problem is a pytree: ``u0`` and ``p`` are leaves (so a NeuralODE's vector
field parameters are trained like any other weight), while the RHS callables
are static. ``remake`` mirrors DiffEq's ``remake(prob; u0=..., p=..., tspan=...)``
(reference: GOKU.jl:111,117) but is just a functional record update.

No ModelingToolkit-style Jacobian codegen is needed (reference:
pendulum.jl:35-37): explicit RK solvers never form Jacobians, and any
sensitivity Jacobian-vector products come for free from JAX tracing.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import module, static_field


@module
class ODEProblem:
    """du/dt = f(u, p, t).

    ``f`` maps ``(u, p, t) -> du`` where ``u`` is the state array ``(dim,)``
    and ``p`` is an arbitrary parameter pytree.
    """

    u0: jax.Array
    tspan: Tuple
    p: Any
    f: Callable = static_field(default=None)

    def remake(self, *, u0=None, p=None, tspan=None, f=None) -> "ODEProblem":
        return ODEProblem(
            f=f if f is not None else self.f,
            u0=u0 if u0 is not None else self.u0,
            tspan=tspan if tspan is not None else self.tspan,
            p=p if p is not None else self.p,
        )


@module
class SDEProblem:
    """du = f(u, p, t) dt + g(u, p, t) dW  (diagonal/additive noise).

    ``g`` returns the diffusion with the same shape as ``u`` (diagonal noise),
    matching the reference's additive-noise stochastic pendulum
    (reference: pendulum.jl:122-131, ``du .= 0.01f0``).
    """

    u0: jax.Array
    tspan: Tuple
    p: Any
    f: Callable = static_field(default=None)
    g: Callable = static_field(default=None)

    def remake(self, *, u0=None, p=None, tspan=None) -> "SDEProblem":
        return SDEProblem(
            f=self.f, g=self.g,
            u0=u0 if u0 is not None else self.u0,
            tspan=tspan if tspan is not None else self.tspan,
            p=p if p is not None else self.p,
        )


def remake(prob, **kwargs):
    """Functional analogue of DiffEq's ``remake`` (reference: GOKU.jl:111,117)."""
    return prob.remake(**kwargs)


@module
class Solution:
    """Result of a solve.

    - ``ts``: (T,) save times
    - ``ys``: (T, dim) states at ``ts`` (or (batch, T, dim) for ensembles)
    - ``success``: bool scalar (or (batch,) for ensembles). Failure — step-size
      underflow, step budget exhausted, or non-finite state — mirrors
      ``sol.retcode != :Success`` in the reference (GOKU.jl:114).
    - ``stats``: dict of counters. ``n_rhs_evals`` is the benchmark currency
      (BASELINE.md); the reference never counts these (SURVEY.md §5).
    """

    ts: jax.Array
    ys: jax.Array
    success: jax.Array
    stats: dict
