"""ELBO losses (reference: src/utils/utils.jl:1-49 and the training scripts'
``loss_batch``, examples/pendulum_friction-less/model_train.jl:225-238).

Layout note: the reference's arrays are (pixels, batch, time); ours are
(batch, time, pixels). The reference's reductions translate as:
  reconstruction = sum over pixels of mean over (batch, time) of sq. error
  KL             = sum over latent dims, mean over batch (per z0/theta group)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["kl", "vector_kl", "vector_mse", "reconstruction_loss",
           "loss_batch"]


def kl(mu, logvar):
    """Elementwise KL(N(mu, exp(logvar)) || N(0, 1))
    (reference: utils.jl:16)."""
    return (jnp.exp(logvar) + mu ** 2 - logvar - 1) / 2


def _kl_group(mu, logvar, free_bits: float = 0.0):
    # sum over latent dim, mean over batch (reference: utils.jl:18-32).
    # free_bits > 0: clamp each dim's batch-mean KL from below (Kingma et
    # al. 2016 "free bits") so the optimizer gains nothing by collapsing a
    # dim past the floor — the standard posterior-collapse guard. 0 = the
    # reference's plain KL.
    per_dim = jnp.mean(kl(mu, logvar), axis=0)          # (latent,)
    if free_bits > 0.0:
        per_dim = jnp.maximum(per_dim, free_bits)
    return jnp.sum(per_dim)


def vector_kl(mu, logvar, free_bits: float = 0.0):
    """KL for either a (batch, latent) array (LatentODE, utils.jl:34-44) or
    a tuple of them (GOKU's (z0, theta), utils.jl:18-32): per group, sum over
    dims and mean over batch; groups summed. ``free_bits`` floors each
    latent dim's KL (anti-collapse; 0 = reference semantics)."""
    if isinstance(mu, (tuple, list)):
        return sum(_kl_group(m, lv, free_bits)
                   for m, lv in zip(mu, logvar))
    return _kl_group(mu, logvar, free_bits)


def vector_mse(x, x_hat):
    """Sum over features of mean over (batch, time) squared error
    (reference: utils.jl:5-13, operating on vectors-of-matrices)."""
    se = (x - x_hat) ** 2
    return jnp.sum(jnp.mean(se, axis=(0, 1)))


# The training scripts' reconstruction term is the same reduction
# (model_train.jl:232: sum(mean((x - x̂)^2, dims=(2, 3)))).
reconstruction_loss = vector_mse


def loss_batch(model, x, t, beta, *, variational: bool = True,
               key: Optional[jax.Array] = None, mask_failures: bool = False,
               free_bits: float = 0.0, cur_len=None, anchor=None,
               anchor_weight: float = 0.0, anchor_frames=None):
    """The reference's ``loss_batch`` (model_train.jl:225-238):
    reconstruction + beta * KL.

    Returns ``(loss, metrics)``. With ``mask_failures=True``, samples whose
    ODE solve failed (NaN-filled) are excluded from the reconstruction term
    instead of poisoning the whole batch — the reference lets the NaNs flow
    (SURVEY.md §7); keep False for strict parity. ``free_bits`` floors the
    per-dim KL (anti-posterior-collapse; 0 = reference semantics).

    ``cur_len`` (optional traced int32, masked-curriculum mode): only the
    first ``cur_len`` frames of ``x`` are real — the encoder masks the
    rest (template.py) and the reconstruction term here averages over
    ``cur_len`` frames instead of ``x.shape[1]``, so the loss equals the
    sliced-prefix loss at every curriculum length while the SHAPES (and
    hence the compiled program) stay fixed.

    ``anchor`` + ``anchor_weight`` (latent chart anchor, for KNOWN
    observation models): ``anchor(x) -> (batch, time, z_dim)`` is a
    frame-wise readout of the latent chart from the observations (e.g. a
    ridge inversion of a known sensor map — the pendulum's pixel-angle
    readout, Kuramoto's lift inversion), and the loss gains
    ``anchor_weight * vector_mse(anchor(x), z_hat)`` with the same
    frame/failure masking as the reconstruction term. Measured
    motivation (benchmarks/RESULTS.md round-4 Kuramoto): when the latent
    chart is a permutation-assignment problem, the plain ELBO never
    forms it and actively destroys a warm-started aligned init; the
    anchor makes every training window pay for chart mismatch in the
    latent chart's own coordinates. 0 = reference semantics. No
    reference equivalent (its Kuramoto showcase is reconstruction-only,
    GOKU.jl:124,136).

    ``anchor_frames`` (optional int): anchor only the FIRST k frames of
    the window (normalized over those frames). Measured motivation
    (RESULTS.md round-4 Kuramoto, the anc1 collapse): a whole-window
    anchor is dominated by phase drift compounding through the solve —
    d(phase err) ~ t * d(omega err) — so its gradient rides the long
    solver path and destabilizes the mechanistic parameters (K blown to
    ~15 on Kuramoto); the early frames carry the chart-assignment
    signal with a short (k=1: empty) solver path, leaving omega/K to
    the reconstruction term.
    """
    (x_hat, z_hat, l_hat), mu, logvar, aux = model(
        x, t, variational=variational, key=key, cur_len=cur_len)
    se = (x - x_hat) ** 2
    if cur_len is not None:
        tmask = jnp.arange(x.shape[1]) < cur_len      # (time,)
        se = jnp.where(tmask[None, :, None], se, 0.0)
        n_frames = cur_len
    else:
        n_frames = x.shape[1]
    if mask_failures:
        ok = aux["success"]  # (batch,)
        se = jnp.where(ok[:, None, None], se, 0.0)
        denom = jnp.maximum(jnp.sum(ok), 1)
        rec = jnp.sum(jnp.sum(se, axis=(0, 1)) / (denom * n_frames))
    elif cur_len is not None:
        rec = jnp.sum(jnp.sum(se, axis=(0, 1)) / (x.shape[0] * n_frames))
    else:
        rec = reconstruction_loss(x, x_hat)
    kld = vector_kl(mu, logvar, free_bits)
    loss = rec + beta * kld
    metrics = {"loss": loss, "rec": rec, "kl": kld,
               "n_failed": jnp.sum(~aux["success"]),
               "n_rhs_evals": aux["stats"]["n_rhs_evals"]}
    if anchor is not None and anchor_weight:
        a_se = (anchor(x) - z_hat) ** 2               # (b, time, z_dim)
        a_frames = n_frames
        if anchor_frames is not None:
            amask = jnp.arange(x.shape[1]) < anchor_frames
            a_se = jnp.where(amask[None, :, None], a_se, 0.0)
            a_frames = jnp.minimum(anchor_frames, n_frames)
        if cur_len is not None:
            a_se = jnp.where(tmask[None, :, None], a_se, 0.0)
        if mask_failures:
            a_se = jnp.where(aux["success"][:, None, None], a_se, 0.0)
            anc = jnp.sum(jnp.sum(a_se, axis=(0, 1)) / (denom * a_frames))
        else:
            anc = jnp.sum(jnp.sum(a_se, axis=(0, 1))
                          / (x.shape[0] * a_frames))
        loss = loss + anchor_weight * anc
        metrics["anchor"] = anc
        metrics["loss"] = loss
    return loss, metrics
