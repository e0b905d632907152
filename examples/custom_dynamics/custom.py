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


def StochasticVanDerPol(sigma: float = 0.05, adaptive: bool = True,
                        substeps: int = 1, adaptive_cfg=None):
    """Van der Pol with MULTIPLICATIVE (diagonal) noise du = f dt +
    sigma*u dW — the noise class the reference's ``SOSRI()`` solver
    actually covers (pendulum.jl:103; SPendulum's additive noise is the
    special case SRA1 handles). Solved with the diagonal-noise SRI method
    (SRIW1 tableau, exported as ``SOSRI``) over the virtual Brownian
    tree; ``adaptive=True`` matches the reference default's adaptive
    semantics. The showcase workload for user-brought multiplicative
    SDEs."""
    from latentdiffeq import SOSRI
    from latentdiffeq.models import SDEDynamics
    from latentdiffeq.solve import SDEAdaptiveConfig

    def g(u, p, t):
        return sigma * u

    if adaptive_cfg is None:
        adaptive_cfg = SDEAdaptiveConfig(rtol=1e-2, atol=1e-2,
                                         max_steps=256, depth_cap=8)
    return SDEDynamics(f=_vdp_f, g=g, z_dim=2, theta_dim=1,
                       solver=SOSRI(), substeps=substeps,
                       adaptive=adaptive, adaptive_cfg=adaptive_cfg)


def _kuramoto_f(u, p, t):
    # u: (N,) phases; p = [omega, K]
    omega, K = p[0], p[1]
    diff = u[None, :] - u[:, None]          # phi_j - phi_i
    return omega + (K / u.shape[0]) * jnp.sum(jnp.sin(diff), axis=1)


def Kuramoto(n_oscillators: int = 10, solver=Tsit5(), sensealg=Unrolled(),
             options=SolveOptions(),
             omega_spread: float = 0.0) -> ODEDynamics:
    """Kuramoto phase oscillators with learned theta = [omega, K].

    ``omega_spread = 0`` (the original workload): every oscillator shares
    the trajectory's omega. This makes the latent chart structurally
    non-identifiable — identical oscillators phase-lock EXACTLY for any
    K > 0, so past the transient the N latent phases are one phase and
    any oscillator permutation/merging reconstructs the observations
    (measured: benchmarks/RESULTS.md round-4 Kuramoto section).

    ``omega_spread > 0`` (the classic Kuramoto setting): oscillator i's
    natural frequency is omega + delta_i with FIXED, all-distinct offsets
    delta_i = linspace(-spread, +spread, N) baked into the dynamics (not
    learned). The offsets break the permutation symmetry — each latent
    slot has its own frequency — and create a real locking transition at
    K_c ~ 4*spread/pi (mean-field, uniform spread), so K is observable on
    BOTH sides: drift rate below K_c, entrainment degree above.
    """
    if omega_spread > 0.0:
        deltas = jnp.linspace(-omega_spread, omega_spread, n_oscillators)

        def f(u, p, t):
            omega, K = p[0], p[1]
            diff = u[None, :] - u[:, None]
            return (omega + deltas
                    + (K / u.shape[0]) * jnp.sum(jnp.sin(diff), axis=1))
    else:
        f = _kuramoto_f
    return ODEDynamics(f=f, z_dim=n_oscillators, theta_dim=2,
                       solver=solver, sensealg=sensealg, options=options,
                       transform=jnp.sin)
