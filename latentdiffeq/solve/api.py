"""User-facing solve API: `solve` and `solve_ensemble`.

``solve_ensemble`` is the TPU-native replacement for the reference's
``EnsembleProblem`` + ``EnsembleThreads`` (src/models/GOKU.jl:111-121): the
per-sample CPU-thread fan-out becomes one ``jax.vmap`` over (u0, p) — a
single batched on-chip solve. Failed trajectories are NaN-filled so batch
shapes always match (reference: GOKU.jl:113-114).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..adjoint.modes import AbstractSensealg, Unrolled
from ..adjoint.odeint import SolveOptions, odeint
from .adaptive import AdaptiveConfig, solve_adaptive
from .problem import SDEProblem, Solution
from .rk import Tsit5
from .sde import (SDEAdaptiveConfig, SRA1, solve_sde_adaptive,
                  solve_sde_fixed_grid)

__all__ = ["solve", "solve_ensemble", "make_options", "autosize_max_steps"]


def make_options(*, adaptive: Optional[bool] = None, substeps: int = 1,
                 rtol: float = 1e-3, atol: float = 1e-6,
                 max_steps: int = 256, dt0: Optional[float] = None,
                 interp_stride: int = 1, unroll: int = 1,
                 **adaptive_kw) -> SolveOptions:
    """Build SolveOptions from flat keyword arguments (the ergonomic
    equivalent of the reference's solve kwargs pass-through, GOKU.jl:121).

    ``interp_stride > 1`` (macro-stepping: one method step per N grid
    intervals, interior points from dense output) is an INFERENCE/data-gen
    lever: in training it degrades stability (benchmarks/RESULTS.md
    "macro-stepping"), so selecting it emits a UserWarning — silence it
    only for forward-only workloads.
    """
    if adaptive is None:
        adaptive = True
    if interp_stride > 1:
        import warnings
        warnings.warn(
            "interp_stride > 1 (macro-stepping) is a known-bad TRAINING "
            "configuration — it degrades training stability "
            "(benchmarks/RESULTS.md). Use it for inference/data "
            "generation only.", UserWarning, stacklevel=2)
    return SolveOptions(
        adaptive=adaptive, substeps=substeps, interp_stride=interp_stride,
        unroll=unroll,
        adaptive_cfg=AdaptiveConfig(rtol=rtol, atol=atol,
                                    max_steps=max_steps, dt0=dt0,
                                    **adaptive_kw),
    )


def autosize_max_steps(f, solver, u0s, ps, saveat,
                       options: SolveOptions, *, safety: float = 1.5,
                       floor: int = 16) -> SolveOptions:
    """Size the adaptive step budget from a probe solve.

    The bounded-scan adaptive path pays ``max_steps`` masked iterations per
    trajectory regardless of difficulty (AdaptiveConfig COST NOTE). This
    runs ONE batched probe solve on representative ``(u0s, ps)`` under the
    given options, reads the actual attempt counts, and returns options
    with ``max_steps = ceil(safety * max_attempts)`` — difficulty-sized
    for the workload instead of a defensive default. Host-level utility
    (the budget is a static shape): call at setup time, e.g. on a batch of
    decoded latents, then build the model/dynamics with the result.
    Probes that FAIL under the current budget leave max_steps unchanged
    (raising it is the caller's job — the probe can't see past its cap).
    """
    import math

    @jax.jit
    def probe(u0s, ps):
        def one(u0, p):
            _, success, stats = solve_adaptive(f, solver, u0, p, saveat,
                                               options.adaptive_cfg)
            return success, stats["n_accepted"] + stats["n_rejected"]
        return jax.vmap(one)(u0s, ps)

    success, attempts = jax.device_get(probe(u0s, jnp.asarray(ps)))
    if not success.all():
        return options  # capped probe: no evidence the budget can shrink
    sized = max(floor, int(math.ceil(safety * int(attempts.max()))))
    sized = min(sized, options.adaptive_cfg.max_steps)
    import dataclasses
    return dataclasses.replace(
        options, adaptive_cfg=dataclasses.replace(
            options.adaptive_cfg, max_steps=sized))


def _pop_sde_kwargs(kwargs) -> dict:
    """Extract the SDE solve options from flat kwargs (mirrors the ODE
    branch's strictness: leftovers raise in the caller)."""
    return {
        "substeps": kwargs.pop("substeps", 1),
        "checkpoint": kwargs.pop("checkpoint", False),
        "adaptive": kwargs.pop("adaptive", False),
        "rtol": kwargs.pop("rtol", 1e-2),
        "atol": kwargs.pop("atol", 1e-2),
        "max_steps": kwargs.pop("max_steps", 1024),
        "depth_cap": kwargs.pop("depth_cap", 10),
    }


def _solve_sde_one(prob, solver, saveat, key, kw):
    if kw["adaptive"]:
        cfg = SDEAdaptiveConfig(rtol=kw["rtol"], atol=kw["atol"],
                                max_steps=kw["max_steps"],
                                depth_cap=kw["depth_cap"])
        return solve_sde_adaptive(prob.f, prob.g, solver, prob.u0, prob.p,
                                  saveat, key, cfg)
    return solve_sde_fixed_grid(prob.f, prob.g, solver, prob.u0, prob.p,
                                saveat, key, substeps=kw["substeps"],
                                checkpoint=kw["checkpoint"])


def solve(prob, solver=None, *, saveat, sensealg: AbstractSensealg = Unrolled(),
          options: Optional[SolveOptions] = None, key=None,
          **kwargs) -> Solution:
    """Solve a single trajectory, saving at ``saveat``.

    For ``SDEProblem``s, ``key`` drives the Brownian path and only fixed-grid
    solving with pathwise (unrolled) gradients is supported.
    """
    saveat = jnp.asarray(saveat)
    if isinstance(prob, SDEProblem):
        if solver is None:
            solver = SRA1()  # the SOSRI-role default (pendulum.jl:103)
        if key is None:
            raise ValueError("SDE solve requires a PRNG `key`")
        sde_kw = _pop_sde_kwargs(kwargs)
        if kwargs:
            raise TypeError(f"unsupported SDE solve kwargs: {kwargs}")
        ys, success, stats = _solve_sde_one(prob, solver, saveat, key,
                                            sde_kw)
        return Solution(ts=saveat, ys=ys, success=success, stats=stats)

    if solver is None:
        solver = Tsit5()
    if options is None:
        options = make_options(**kwargs)
    elif kwargs:
        raise TypeError("pass either `options` or flat kwargs, not both")
    ys, success, stats = odeint(prob.f, solver, prob.u0, prob.p, saveat,
                                options, sensealg)
    return Solution(ts=saveat, ys=ys, success=success, stats=stats)


def solve_ensemble(prob, solver=None, *, u0s, ps, saveat,
                   sensealg: AbstractSensealg = Unrolled(),
                   options: Optional[SolveOptions] = None, key=None,
                   nan_fill: bool = True, **kwargs) -> Solution:
    """Batched solve over per-trajectory ``(u0s, ps)``.

    - ``u0s``: (batch, dim); ``ps``: parameter pytree batched on axis 0.
    - Each trajectory keeps its own adaptive step sequence (vmapped masked
      stepping), matching the reference's per-sample EnsembleThreads solves.
    - Trajectories whose solve failed are NaN-filled (GOKU.jl:113-114) when
      ``nan_fill=True``; inspect ``sol.success`` (batch,) either way.
    """
    saveat = jnp.asarray(saveat)
    if isinstance(prob, SDEProblem):
        if solver is None:
            solver = SRA1()
        if key is None:
            raise ValueError("SDE solve requires a PRNG `key`")
        sde_kw = _pop_sde_kwargs(kwargs)
        if kwargs:
            raise TypeError(f"unsupported SDE solve kwargs: {kwargs}")
        batch = u0s.shape[0]
        keys = jax.random.split(key, batch)
        ys, success, stats = jax.vmap(
            lambda u0, p, k: _solve_sde_one(prob.remake(u0=u0, p=p), solver,
                                            saveat, k, sde_kw)
        )(u0s, ps, keys)
    else:
        if solver is None:
            solver = Tsit5()
        if options is None:
            options = make_options(**kwargs)
        elif kwargs:
            raise TypeError("pass either `options` or flat kwargs, not both")
        ys, success, stats = jax.vmap(
            lambda u0, p: odeint(prob.f, solver, u0, p, saveat, options,
                                 sensealg)
        )(u0s, ps)

    if nan_fill:
        ys = jnp.where(success[:, None, None], ys, jnp.nan)
    stats = jax.tree_util.tree_map(lambda s: jnp.sum(s), stats)
    return Solution(ts=saveat, ys=ys, success=success, stats=stats)
