"""User-defined mechanistic latent dynamics (BASELINE.json config 4).

Demonstrates the reference's extension pattern (a user writes a
``{prob, solver, sensealg, kwargs}`` struct, pendulum.jl:4-10) for two
classic systems:

- Van der Pol: dx = y, dy = mu (1 - x^2) y - x; learned theta = [mu].
- Kuramoto: N phase oscillators, d phi_i = omega + (K/N) sum_j
  sin(phi_j - phi_i); learned theta = [omega, K], observed through
  ``transform_after_diffeq = sin`` — the transform hook's intended use
  ("mainly used for Kuramoto-like systems", reference: LatentODE.jl:76,
  GOKU.jl:124,136).
"""
import jax.numpy as jnp

from latentdiffeq import SolveOptions, Tsit5, Unrolled
from latentdiffeq.models import ODEDynamics


def _vdp_f(u, p, t):
    x, y = u[0], u[1]
    mu = p[0]
    return jnp.stack([y, mu * (1.0 - x * x) * y - x])


def VanDerPol(solver=Tsit5(), sensealg=Unrolled(),
              options=SolveOptions()) -> ODEDynamics:
    return ODEDynamics(f=_vdp_f, z_dim=2, theta_dim=1, solver=solver,
                       sensealg=sensealg, options=options)


def _kuramoto_f(u, p, t):
    # u: (N,) phases; p = [omega, K]
    omega, K = p[0], p[1]
    diff = u[None, :] - u[:, None]          # phi_j - phi_i
    return omega + (K / u.shape[0]) * jnp.sum(jnp.sin(diff), axis=1)


def Kuramoto(n_oscillators: int = 10, solver=Tsit5(), sensealg=Unrolled(),
             options=SolveOptions()) -> ODEDynamics:
    return ODEDynamics(f=_kuramoto_f, z_dim=n_oscillators, theta_dim=2,
                       solver=solver, sensealg=sensealg, options=options,
                       transform=jnp.sin)
