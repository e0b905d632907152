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
    # Fixed-grid substeps used when re-solving an interval in the backward
    # pass of an *adaptive* forward solve (fixed-grid forwards reuse their
    # own substep count and the gradients are exact).
    bwd_substeps: int = 8


@dataclasses.dataclass(frozen=True)
class BacksolveAdjoint(AbstractSensealg):
    # Substeps of the backward fixed-grid integration per saveat interval.
    bwd_substeps: int = 8
    # Reset the reconstructed state to the stored forward state at each
    # saveat checkpoint (piecewise backsolve; much more stable).
    checkpointing: bool = True
