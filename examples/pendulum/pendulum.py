"""Pendulum problem definitions.

Rebuilds the reference's three diffeq specs (examples/pendulum_friction-less/
pendulum.jl): frictionless pendulum, damped pendulum, and additive-noise
stochastic pendulum. No ModelingToolkit step is needed (reference:
pendulum.jl:35-37): explicit RK never forms Jacobians and JAX traces the
vector field directly.

The vector fields are written for fusion: under `vmap` the whole batch's RHS
evaluates as a couple of fused VPU ops on-chip.
"""
import jax.numpy as jnp

from latentdiffeq import Tsit5, SRA1, Unrolled, SolveOptions
from latentdiffeq.models import ODEDynamics, SDEDynamics
from latentdiffeq.solve.sde import SDEAdaptiveConfig

G = 10.0


def _pendulum_f(u, p, t):
    """du1 = u2; du2 = -G/L * sin(u1), theta = [L]
    (reference: pendulum.jl:19-26)."""
    x, y = u[0], u[1]
    L = p[0]
    return jnp.stack([y, -G / L * jnp.sin(x)])


def _pendulum_friction_f(u, p, t):
    """Adds damping -(b/m) * y, b=0.7, m=1 (reference: pendulum.jl:64-73)."""
    x, y = u[0], u[1]
    L = p[0]
    b, m = 0.7, 1.0
    return jnp.stack([y, -G / L * jnp.sin(x) - (b / m) * y])


def _spendulum_g(u, p, t):
    """Additive noise du .= 0.01 (reference: pendulum.jl:122-124)."""
    return jnp.full_like(u, 0.01)


def Pendulum(solver=Tsit5(), sensealg=Unrolled(),
             options=SolveOptions()) -> ODEDynamics:
    """Frictionless pendulum spec (reference: pendulum.jl:4-46).
    Defaults: Tsit5 + discretize-then-optimize sensitivity."""
    return ODEDynamics(f=_pendulum_f, z_dim=2, theta_dim=1, solver=solver,
                       sensealg=sensealg, options=options)


def PendulumFriction(solver=Tsit5(), sensealg=Unrolled(),
                     options=SolveOptions()) -> ODEDynamics:
    """Damped pendulum spec (reference: pendulum.jl:51-91)."""
    return ODEDynamics(f=_pendulum_friction_f, z_dim=2, theta_dim=1,
                       solver=solver, sensealg=sensealg, options=options)


def SPendulum(solver=SRA1(), substeps: int = 1, adaptive: bool = False,
              adaptive_cfg: SDEAdaptiveConfig = None) -> SDEDynamics:
    """Stochastic pendulum with additive noise (reference:
    pendulum.jl:96-140). Solved with SRA1 — the SOSRI-role strong-order-1.5
    additive-noise method — over a refinement-consistent virtual Brownian
    tree path. ``adaptive=True`` matches the reference default ``SOSRI()``'s
    adaptive semantics (pendulum.jl:103): per-trajectory dyadic step
    bisection driven by the embedded drift error."""
    if adaptive_cfg is None:
        adaptive_cfg = SDEAdaptiveConfig()
    return SDEDynamics(f=_pendulum_f, g=_spendulum_g, z_dim=2, theta_dim=1,
                       solver=solver, substeps=substeps, adaptive=adaptive,
                       adaptive_cfg=adaptive_cfg)
