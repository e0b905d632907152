"""Sensitivity algorithms — how gradients flow through the solve.

The reference delegates this to SciMLSensitivity: ``ForwardDiffSensitivity()``
(discretize-then-optimize, pendulum.jl:11) and the commented
``BacksolveAdjoint(autojacvec=ReverseDiffVJP(true))`` alternative
(nODE.jl:18). TPU-native equivalents:

- ``Unrolled``: reverse-mode AD straight through the solver's `lax.scan`
  (exact gradients of the discrete solve). With ``checkpoint=True`` each grid
  interval is rematerialized in the backward pass (`jax.checkpoint`), trading
  FLOPs for memory.
- ``InterpolatingAdjoint``: discrete checkpointing at the ``saveat`` points —
  the backward pass re-solves each interval from the stored state and
  backprops through the recomputation. Memory O(T), like SciMLSensitivity's
  InterpolatingAdjoint(checkpointing=true).
- ``BacksolveAdjoint``: continuous adjoint ODE integrated backward in time
  (Chen et al. 2018), with optional state reset at each ``saveat`` checkpoint
  for stability (reset matches SciMLSensitivity's checkpointed backsolve).
"""
from __future__ import annotations

import dataclasses

__all__ = ["Unrolled", "InterpolatingAdjoint", "BacksolveAdjoint",
           "AbstractSensealg"]


@dataclasses.dataclass(frozen=True)
class AbstractSensealg:
    pass


@dataclasses.dataclass(frozen=True)
class Unrolled(AbstractSensealg):
    checkpoint: bool = False


@dataclasses.dataclass(frozen=True)
class InterpolatingAdjoint(AbstractSensealg):
    """Discrete checkpointing at ``saveat``; the backward pass re-solves
    each interval from the stored state and backprops through the
    recomputation. With ``adaptive=True`` (default) the re-solve is
    error-controlled (PI-stepped to ``bwd_rtol``/``bwd_atol``) — gradient
    accuracy on stiff intervals no longer depends on a fixed substep guess.
    ``adaptive=False`` keeps the cheaper fixed ``bwd_substeps`` re-solve.
    (Fixed-grid forwards are exact either way: they rematerialize their own
    steps.)"""
    bwd_substeps: int = 8
    adaptive: bool = True
    bwd_rtol: float = 1e-4
    bwd_atol: float = 1e-7
    bwd_max_steps: int = 32   # per saveat interval


@dataclasses.dataclass(frozen=True)
class BacksolveAdjoint(AbstractSensealg):
    """Continuous adjoint ODE integrated backward in time (Chen et al.
    2018; the role of SciMLSensitivity's
    ``BacksolveAdjoint(autojacvec=ReverseDiffVJP(true))``, reference:
    examples/pendulum_friction-less/nODE.jl:18). With ``adaptive=True``
    (default) the augmented backward system is integrated with
    error-controlled steps per saveat interval."""
    bwd_substeps: int = 8
    adaptive: bool = True
    bwd_rtol: float = 1e-4
    bwd_atol: float = 1e-7
    bwd_max_steps: int = 32   # per saveat interval
    # Reset the reconstructed state to the stored forward state at each
    # saveat checkpoint (piecewise backsolve; much more stable).
    checkpointing: bool = True
