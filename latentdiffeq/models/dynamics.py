"""Dynamics specs for the diffeq slot.

The reference's diffeq slot is a struct bundling ``{prob, solver, sensealg,
kwargs}`` for mechanistic dynamics (reference:
examples/pendulum_friction-less/pendulum.jl:4-10) or ``{dudt, solver,
neural_model, latent_dim_in/out, augment_dim, kwargs}`` for a neural ODE
(reference: examples/pendulum_friction-less/nODE.jl:3-12). TPU-native
equivalents:

- ``ODEDynamics`` / ``SDEDynamics``: a mechanistic vector field with unknown
  parameters theta inferred by the GOKU encoder. Pure static metadata (the
  prototype u0/p of the Julia ODEProblem carry no information the model
  uses — only their dims do).
- ``NeuralODEDynamics``: the latent vector field is a trainable network
  (pytree child), optionally augmented (ANODE, reference: LatentODE.jl:72).

Both carry a ``transform`` hook applied to the solved trajectory —
``transform_after_diffeq`` (reference: GOKU.jl:124,136; "mainly used for
Kuramoto-like systems", LatentODE.jl:76).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

from ..adjoint.modes import AbstractSensealg, Unrolled
from ..adjoint.odeint import SolveOptions
from ..core import module, static_field
from ..solve.rk import AbstractSolver, Tsit5
from ..solve.sde import AbstractSDESolver, SDEAdaptiveConfig, SRA1

__all__ = ["ODEDynamics", "SDEDynamics", "NeuralODEDynamics"]


@module
class ODEDynamics:
    """Mechanistic ODE: du/dt = f(u, theta, t), theta learned per-sample by
    the GOKU encoder (reference: pendulum.jl:19-26 + GOKU.jl:111)."""

    f: Callable = static_field(default=None)
    z_dim: int = static_field(default=2)
    theta_dim: int = static_field(default=1)
    solver: AbstractSolver = static_field(default=Tsit5())
    sensealg: AbstractSensealg = static_field(default=Unrolled())
    options: SolveOptions = static_field(default=SolveOptions())
    transform: Optional[Callable] = static_field(default=None)


@module
class SDEDynamics:
    """Mechanistic SDE: du = f dt + g dW (reference: SPendulum,
    pendulum.jl:96-140).

    ``adaptive=False`` (default) integrates on the saveat grid with
    ``substeps`` method steps per interval; ``adaptive=True`` dispatches to
    :func:`solve_sde_adaptive` — per-trajectory dyadic step bisection driven
    by SRA1's embedded drift error, the semantics of the reference's
    ``SOSRI()`` default (reference: pendulum.jl:103, plumbed through the
    diffeq slot at GOKU.jl:121). Both consume the same virtual Brownian
    tree, so switching modes keeps the path law."""

    f: Callable = static_field(default=None)
    g: Callable = static_field(default=None)
    z_dim: int = static_field(default=2)
    theta_dim: int = static_field(default=1)
    solver: AbstractSDESolver = static_field(default=SRA1())
    substeps: int = static_field(default=1)
    adaptive: bool = static_field(default=False)
    adaptive_cfg: SDEAdaptiveConfig = static_field(
        default=SDEAdaptiveConfig())
    transform: Optional[Callable] = static_field(default=None)


@module
class NeuralODEDynamics:
    """Neural ODE latent dynamics (reference: nODE.jl:13-31).

    ``dudt``: trainable network mapping (..., dim) -> (..., dim) where
    dim = latent_dim_in + augment_dim. ``augment_dim > 0`` gives an
    augmented neural ODE (zero-padding of the initial state, the role of
    DiffEqFlux's AugmentedNDELayer at reference LatentODE.jl:72).
    """

    dudt: Any
    latent_dim_in: int = static_field(default=16)
    augment_dim: int = static_field(default=0)
    solver: AbstractSolver = static_field(default=Tsit5())
    sensealg: AbstractSensealg = static_field(default=Unrolled())
    options: SolveOptions = static_field(default=SolveOptions())
    transform: Optional[Callable] = static_field(default=None)

    @property
    def latent_dim_out(self) -> int:
        return self.latent_dim_in + self.augment_dim
