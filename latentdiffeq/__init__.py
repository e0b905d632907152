"""latentdiffeq — a TPU-native latent differential equation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gabrevaya/LatentDiffEq.jl: GOKU-net and Latent-ODE model templates over
from-scratch ODE/SDE solvers, with selectable sensitivity algorithms,
variational training utilities, and multi-chip data parallelism via
`jax.sharding`.

Layout (SURVEY.md §7):
  nn/        layers (Dense/resnet/RNN/LSTM), Flux-compatible inits
  solve/     ODE/SDE solvers: fixed-grid + adaptive (PI controller, dense
             output), batched ensembles with NaN-fill failure semantics
  adjoint/   gradient modes: unrolled, interpolating (checkpointed),
             backsolve (continuous adjoint)
  ops/       Pallas TPU kernels for the hot paths
  models/    the six-slot latent-DE template; GOKU and LatentODE
  train/     ELBO losses, KL annealing, windowing, optimizers, trainer,
             checkpointing, visualization
  parallel/  device-mesh data parallelism (shard_map + psum over ICI)
"""

__version__ = "0.1.0"

import os as _os

# Platform escape hatch: some environments pin jax_platforms at interpreter
# start via sitecustomize (ignoring JAX_PLATFORMS). LDQ_PLATFORM=cpu forces
# the CPU backend (e.g. for the virtual multi-device fleet) as long as
# latentdiffeq is imported before any backend initializes.
if _os.environ.get("LDQ_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["LDQ_PLATFORM"])

from .core import module, static_field, Identity, tree_size
from . import nn
from .solve import (
    ODEProblem, SDEProblem, Solution, remake,
    Euler, Midpoint, RK4, Tsit5, Dopri5, EulerMaruyama, StochasticHeun,
    SRA1, SRIW1, SOSRI, SDEAdaptiveConfig,
    solve, solve_ensemble, make_options, autosize_max_steps,
    AdaptiveConfig,
)
from .adjoint import (
    Unrolled, InterpolatingAdjoint, BacksolveAdjoint, odeint, SolveOptions,
)
# Utility exports mirroring the reference's module root
# (src/LatentDiffEq.jl:21-22)
from .train import (
    vector_mse, kl, vector_kl, frange_cycle_linear,
    normalize_to_unit_segment, denormalize_unit_segment, time_loader,
    rand_time,
)
from . import models, train, parallel, ops, utils

__all__ = [
    "module", "static_field", "Identity", "tree_size", "nn",
    "ODEProblem", "SDEProblem", "Solution", "remake",
    "Euler", "Midpoint", "RK4", "Tsit5", "Dopri5",
    "EulerMaruyama", "StochasticHeun", "SRA1", "SRIW1", "SOSRI",
    "SDEAdaptiveConfig",
    "solve", "solve_ensemble", "make_options", "autosize_max_steps",
    "AdaptiveConfig",
    "Unrolled", "InterpolatingAdjoint", "BacksolveAdjoint",
    "odeint", "SolveOptions",
    "vector_mse", "kl", "vector_kl", "frange_cycle_linear",
    "normalize_to_unit_segment", "denormalize_unit_segment",
    "time_loader", "rand_time",
    "models", "train", "parallel", "ops", "utils",
]
