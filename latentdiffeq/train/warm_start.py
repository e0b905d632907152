"""Latent-regression warm start: pull a model's deterministic
encode -> latent_out path onto caller-supplied targets before ELBO
training.

Motivation (measured, benchmarks/RESULTS.md round-4 Kuramoto): when the
latent chart is a discrete assignment problem (N oscillators routed
through N latent slots), gradient descent from a random init lands in a
mixed-permutation basin and the ELBO never escapes it — the known-lift
constructive test eliminated decoder, data, capacity, and curriculum as
causes. The fix is initialization: invert the KNOWN observation model
for unsupervised latent estimates (the pendulum's pixel-angle readout,
examples/pendulum/pixel_observable.py; Kuramoto's lift inversion,
examples/custom_dynamics/train_kuramoto.py::invert_lift_phases), then
regress the encoder into the aligned basin.

This module is the generic machinery — the deterministic-path wiring,
the optimizer scan, the convergence trace. The TARGETS are domain code
by construction (the selector campaign's lesson: identification needs an
observable tied to the domain's observation model), so the caller
supplies ``loss_fn`` over the latent_out pytree.

Pure-functional: `latent_warm_start` is jit/vmap-compatible, so a
population can warm-start inside one compiled program under
``MultiSeedTrainer``'s vmapped model factory.

Reference surface: none — the reference (gabrevaya/LatentDiffEq.jl) has
no warm-start facility; this closes the identification gap its Kuramoto
showcase leaves open (reconstruction-only, GOKU.jl:124,136).
"""
from __future__ import annotations

from typing import Callable

import jax

from .optim import adam, apply_updates

__all__ = ["latent_warm_start"]


def latent_warm_start(model, x, loss_fn: Callable, *, steps: int = 500,
                      lr: float = 1e-3, optimizer=None,
                      with_moments: bool = False):
    """Regress the deterministic encode -> latent_out path onto targets.

    Runs ``steps`` full-batch optimizer steps minimizing
    ``loss_fn(l_hat)`` where ``l_hat = apply_latent_out(decoder,
    encoder(x).mu)`` — the same deterministic latent estimate the
    model's ``variational=False`` forward uses. Gradients flow into the
    encoder and the latent_out heads (and nothing else: the loss never
    touches the diffeq or reconstructor slots).

    Args:
        model: a ``LatentDiffEqModel`` pytree.
        x: (batch, time, features) observations (full-batch; slice or
            subsample before calling if memory-bound).
        loss_fn: scalar loss over the latent_out output pytree (e.g.
            GOKU: ``(z0_hat, theta_hat)``). Match in whatever chart is
            wrap-safe for the domain — e.g. phases in (sin, cos) space.
        steps: optimizer steps (static: compiled into one lax.scan).
        lr: Adam learning rate (ignored if ``optimizer`` is given).
        optimizer: any ``train.optim`` optimizer; default ``adam(lr)``.
        with_moments: call ``loss_fn(l_hat, mu, logvar)`` instead, so
            the warm loss can ALSO regularize the posterior moments.
            Measured motivation (RESULTS.md round-4 Kuramoto): freshly
            initialized logvar heads emit O(1) values, so the first
            variational epochs sample with sigma ~ exp(O(1)/2) ~ 1-3 —
            enough latent noise to kick training out of a warm-started
            basin before the ELBO can hold it; pulling logvar down
            toward a small sigma in the same regression keeps the init
            usable under ``variational=True``.

    Returns:
        (warm_model, losses): the warm-started model and the (steps,)
        loss trace — check ``losses[-1]`` converged before trusting the
        init.
    """
    opt = adam(lr) if optimizer is None else optimizer

    def objective(m):
        mu, logvar = m.encoder(x)
        l_hat = m.model_type.apply_latent_out(m.decoder, mu)
        if with_moments:
            return loss_fn(l_hat, mu, logvar)
        return loss_fn(l_hat)

    def step(carry, _):
        m, st = carry
        loss, grads = jax.value_and_grad(objective)(m)
        updates, st = opt.update(grads, st, m)
        return (apply_updates(m, updates), st), loss

    (warm, _), losses = jax.lax.scan(step, (model, opt.init(model)), None,
                                     length=steps)
    return warm, losses
