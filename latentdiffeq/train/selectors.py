"""Domain-agnostic unsupervised population selection scores.

``MultiSeedTrainer.select`` takes any ``score_fn(models_stacked) -> (S,)``;
this module provides the library scorer that needs NO domain knowledge —
no renderer inversion, no latent ground truth — only the observations the
user already has.

Measured background (benchmarks/RESULTS.md, rounds 2-3):

- every training-signal selector (best-val, beta=1 ELBO, forecast recon
  MSE, theta-window ICC, z-window consistency) fails mid-anneal on at
  least one committed population (selector shoot-out);
- forecast-recon **MSE** specifically fails because a collapsed replica's
  blurry temporal-mean prediction beats a misphased sharp one in MSE;
- beyond-context agreement ALONE is gameable early in training (epoch-100
  phase tracking at corr 0.85 with 7x-gate length error — diagnostic
  record ttg_fc_pop8_px.json), so extrapolation scoring must be
  conditioned on in-context fit;
- the domain scorer that closes the gap on the pendulum (pixel-angle
  observable, Spearman 1.0) works by scoring the *time-varying* part of
  the observations.

The scorer here combines those three lessons in observation space:

1. **Temporally-centered agreement** (:func:`temporal_agreement`): per
   trajectory, remove each observation channel's TEMPORAL mean from both
   prediction and data, then Pearson-correlate what remains. A static or
   blurry-mean prediction has (near-)zero temporal variance and scores
   ~0 instead of winning the MSE race — the variance normalization is
   what kills the collapsed-replica failure mode of forecast-recon MSE.
2. **Forecast conditioning** (:func:`observation_composite_scores`): the
   final score is the BEYOND-context agreement (encode only ``ctx``
   frames, predict the rest — frames the user has but the encoder never
   saw), admitted only for replicas whose in-context agreement clears a
   bar; everyone else ranks by in-context progress below every passer
   (the composite law of
   examples/pendulum/pixel_observable.composite_scores, generalized).
3. **Self-scaling bar**: observation-space agreement scales differ per
   domain (noise level, observation richness), so the default bar is
   RELATIVE — within ``rel_margin`` of the best finite in-context score
   in the population — with an absolute float bar available when the
   domain has a known scale.

reference: the selection role of the user's visual inspection at
examples/pendulum_friction-less/model_train.jl:210,244-290 — performed on
exactly these observations — made quantitative and domain-generic.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["temporal_agreement", "observation_forecast_scores",
           "observation_composite_scores", "combine_composite",
           "observation_consensus_scores"]


def temporal_agreement(x_pred, x_true, start: int = 0) -> float:
    """Median per-trajectory Pearson correlation between temporally
    centered prediction and data over frames ``[start:]``.

    ``x_pred, x_true``: (n, T, *obs_dims). Each observation channel's
    temporal mean over the scored frames is removed from BOTH arrays
    before correlating, so a prediction with no temporal dynamics (frozen
    frame, blurry mean) scores ~0 rather than profiting from reproducing
    the static background. Non-finite predictions score -inf.
    """
    p = np.asarray(x_pred, np.float64)[:, start:]
    q = np.asarray(x_true, np.float64)[:, start:]
    n = p.shape[0]
    p = p.reshape(n, p.shape[1], -1)
    q = q.reshape(n, q.shape[1], -1)
    finite = np.all(np.isfinite(p), axis=(1, 2))   # per-trajectory
    p = np.where(np.isfinite(p), p, 0.0)
    p = p - p.mean(axis=1, keepdims=True)
    q = q - q.mean(axis=1, keepdims=True)
    num = (p * q).sum(axis=(1, 2))
    den = np.sqrt((p * p).sum(axis=(1, 2)) * (q * q).sum(axis=(1, 2)))
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where(den > 0, num / den, 0.0)
    # a non-finite prediction is a diverged solve, not "zero agreement":
    # it must lose to every finite replica, so it poisons the median
    r = np.where(finite, r, -np.inf)
    med = np.median(r)
    return float(med) if np.isfinite(med) else -np.inf


@jax.jit
def _pop_decode_impl(models, xv, t, key):
    def one(m):
        mu, _ = m.encoder(xv)
        (x_hat, _, _), _ = m.decoder(mu, t, key=key)
        return x_hat

    return jax.vmap(one)(models)


def _pop_decode(models, xv, t, key=None):
    """Stacked-population deterministic decode: one compiled vmap over the
    seed axis (module-level so repeated selection evals reuse the cache).

    ``key`` seeds the decoder's noise path (SDE dynamics only — ODE
    decoders ignore it; default PRNGKey(0) keeps ODE selection
    deterministic). Every replica shares the same key, so an SDE
    selection compares replicas on one common Brownian realization; pass
    different keys across calls (or average scores over a few) to
    de-noise SDE rankings rather than scoring one fixed lucky path."""
    key = jax.random.PRNGKey(0) if key is None else key
    return _pop_decode_impl(models, xv, t, key)


def observation_forecast_scores(models_stacked, val_set, dt: float,
                                ctx: int, key=None) -> np.ndarray:
    """(S,) beyond-context temporal agreement for every replica: encode
    only ``val_set[:, :ctx]``, predict the full horizon, score frames
    ``[ctx:]`` against the data. Observations only. ``key`` seeds SDE
    decoders' noise (default: fixed PRNGKey(0) — deterministic, fine for
    ODE decoders; supply/average keys for SDE selection)."""
    key = jax.random.PRNGKey(0) if key is None else key
    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt
    xh = np.asarray(_pop_decode(models_stacked, xv[:, :ctx], t, key))
    return np.asarray([temporal_agreement(x, val_set, start=ctx)
                       for x in xh])


def observation_composite_scores(models_stacked, val_set, dt: float,
                                 ctx: int,
                                 incontext_bar: Union[float, str] = "rel",
                                 rel_margin: float = 0.02,
                                 key=None) -> np.ndarray:
    """(S,) domain-agnostic composite selection score (see module
    docstring): beyond-context temporal agreement among replicas whose
    in-context (full-encode, full-horizon) temporal agreement clears the
    bar; others rank by in-context progress strictly below every passer;
    non-finite replicas -inf.

    **Measured status — use as a baseline, not a default** (probe over
    six committed populations, selector_generic_probe.json): 1/6 hit
    rate (top-1 or Spearman >= 0.8); on the stochastic pendulum it
    actively anti-selects (Spearman -1.0). The self-referential score is
    gauge-invariant, so it cannot see sign-gauge or blurry-dynamics
    failures. When the domain has ANY invertible observable, prefer
    :func:`combine_composite` over (in-context, forecast) scores from
    that observable — the measured-positive protocol (the pendulum's
    pixel-angle readout, examples/pendulum/pixel_observable.py, selects
    the true winner at Spearman 1.0). See also
    :func:`observation_consensus_scores` for the cross-replica
    criterion.

    ``incontext_bar``: a float (absolute bar, when the domain's agreement
    scale is known) or ``"rel"`` (default): bar = best finite in-context
    score minus ``rel_margin`` — self-scaling across domains and training
    stages (mid-anneal populations never clear a pendulum-calibrated 0.95
    in a noisy-observation domain; conditioning on "as identified as the
    best available" is the domain-free reading of the measured
    gameable-gate diagnostic).
    """
    key = jax.random.PRNGKey(0) if key is None else key
    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt
    xh_full = np.asarray(_pop_decode(models_stacked, xv, t, key))
    in_ctx = np.asarray([temporal_agreement(x, val_set) for x in xh_full])
    fc = observation_forecast_scores(models_stacked, val_set, dt, ctx, key)
    return combine_composite(in_ctx, fc, incontext_bar, rel_margin)


def combine_composite(in_ctx, fc, incontext_bar: Union[float, str] = "rel",
                      rel_margin: float = 0.02) -> np.ndarray:
    """The composite combination law on precomputed score vectors (see
    :func:`observation_composite_scores`): bar-passers with finite
    forecast score 1 + fc; everyone else in_ctx - 1 (strictly below every
    passer); non-finite in_ctx -inf. ``incontext_bar="rel"`` resolves the
    bar to (max finite in_ctx) - rel_margin."""
    in_ctx = np.asarray(in_ctx, np.float64)
    fc = np.asarray(fc, np.float64)
    if incontext_bar == "rel":
        finite = in_ctx[np.isfinite(in_ctx)]
        bar = (float(finite.max()) - rel_margin) if finite.size else np.inf
    else:
        bar = float(incontext_bar)
    out = np.where((in_ctx >= bar) & np.isfinite(fc), 1.0 + fc,
                   in_ctx - 1.0)
    return np.where(np.isfinite(in_ctx), out, -np.inf)


def observation_consensus_scores(models_stacked, val_set, dt: float,
                                 ctx: int, key=None,
                                 condition_in_ctx: bool = False,
                                 incontext_bar: Union[float, str] = "rel",
                                 rel_margin: float = 0.02) -> np.ndarray:
    """(S,) cross-replica forecast CONSENSUS: each replica's score is the
    median over the other replicas of the pairwise beyond-context
    temporal agreement between the two replicas' predictions.

    Mechanism (distinct from :func:`observation_forecast_scores`, which
    compares each replica to the DATA it was shown): replicas that
    captured the true dynamics must agree with *each other* on the
    frames beyond the encoder context, because the true dynamics is one
    function; replicas that failed idiosyncratically (sign-gauge flips,
    warped charts, blown-up theta) disagree with everyone. The
    self-referential score is gauge-invariant and hence blind to those
    failure modes (measured 1/6 hit rate, selector_generic_probe.json);
    consensus is the mechanically different criterion VERDICT r4 asked
    to probe. Known failure mode to watch for: collapsed replicas
    agreeing with each other on a common blur (the temporal centering in
    :func:`temporal_agreement` removes the static part, so a shared blur
    has ~no temporal variance to agree ON, but a shared slow drift
    could still correlate).

    ``condition_in_ctx=True`` additionally gates by in-context agreement
    with the DATA via :func:`combine_composite` (consensus replaces the
    forecast term) — consensus then only ranks replicas that fit what
    they were shown.

    Per-trajectory pair agreement is centered correlation over frames
    ``[ctx:]`` (median over trajectories, then median over partners).
    Non-finite replicas score -inf and are excluded from everyone
    else's partner set. S=1 populations score 0 (no partners).

    reference: the selection role of the user's visual inspection,
    model_train.jl:210,244-290 — here replicas cross-check each other
    instead of a human checking each.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt
    xh = np.asarray(_pop_decode(models_stacked, xv[:, :ctx], t, key),
                    np.float64)                      # (S, n, T, *obs)
    S = xh.shape[0]
    finite = np.array([np.all(np.isfinite(x)) for x in xh])
    scores = np.full(S, -np.inf)
    for i in range(S):
        if not finite[i]:
            continue
        partners = [j for j in range(S) if j != i and finite[j]]
        if not partners:
            scores[i] = 0.0
            continue
        agr = [temporal_agreement(xh[i], xh[j], start=ctx)
               for j in partners]
        scores[i] = float(np.median(agr))
    if not condition_in_ctx:
        return scores
    xh_full = np.asarray(_pop_decode(models_stacked, xv, t, key))
    in_ctx = np.asarray([temporal_agreement(x, val_set) for x in xh_full])
    return combine_composite(in_ctx, scores, incontext_bar, rel_margin)
