"""Pixels-only pendulum-angle observable — domain code for unsupervised
model selection.

The rendered pendulum's angle is recoverable from each observed frame by
inverting the renderer geometry (create_data.py::render_frame: pivot at
canvas (0, -8.5), y down, bob direction (cos(pi/2+theta),
sin(pi/2+theta))), so corr(theta_hat, theta_pixel) is computable from
observations alone — no latent ground truth. Measured consequences
(benchmarks/RESULTS.md):

- it is the only selector that separates consistent-but-warped latent
  charts from the true chart (round-3 selector shoot-out), and
- selecting the population winner by it (argmax over every replica's
  best-carry AND live weights, ``MultiSeedTrainer.select``) reaches the
  flagship quality gate in 205 s — 4.7x faster than best-val selection,
  which never gates (round-3 time-to-gate campaign).

reference: the reference leaves model selection to the user's eyeballing
of the per-epoch visualization (model_train.jl:210, :244-290); this
module is the quantitative, automatable form of that inspection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pearson_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise Pearson correlation of two (n, T) arrays."""
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    denom = np.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1)) + 1e-12
    return (a * b).sum(axis=1) / denom


def pixel_angles(val_set, h: int = 28, w: int = 28) -> np.ndarray:
    """(n, T) pendulum angle read directly from the observed frames.

    Inverts the renderer geometry (create_data.py::render_frame: pivot at
    canvas (0, -8.5), y down, bob direction (cos(pi/2+theta),
    sin(pi/2+theta))): the intensity-weighted centroid of the frame's
    far-from-pivot mass (rod + bob; the pivot disc carries no direction
    information) points along the rod. Unwrapped along time so Pearson
    correlation is immune to the atan2 branch cut."""
    x = np.asarray(val_set, np.float64).reshape(
        val_set.shape[0], val_set.shape[1], h, w)
    ys = np.arange(h, dtype=np.float64) - (h - 1) / 2.0
    xs = np.arange(w, dtype=np.float64) - (w - 1) / 2.0
    py, px = np.meshgrid(ys, xs, indexing="ij")
    dx = px - 0.0
    dy = py - (-8.5)
    dist = np.hypot(dx, dy)
    wgt = x * np.maximum(dist - 3.0, 0.0)[None, None]
    sx = (wgt * dx[None, None]).sum(axis=(-2, -1))
    sy = (wgt * dy[None, None]).sum(axis=(-2, -1))
    return np.unwrap(np.arctan2(sy, sx) - np.pi / 2, axis=1)


def pendulum_pixel_estimates(x, dt: float, h: int = 28, w: int = 28,
                             G: float = 10.0):
    """UNSUPERVISED per-trajectory latent estimates from pixels alone:
    the warm-start targets for the flagship workload.

    Mirrors the Kuramoto estimator stack (train_kuramoto.py::
    invert_lift_phases + estimate_omega_k): invert the KNOWN observation
    model for the state trajectory, then least-squares the KNOWN
    dynamics residual for the mechanistic parameter. Here: theta(t) from
    the renderer inversion (:func:`pixel_angles`), omega(t) by central
    finite difference, and L from the pendulum residual
    ``theta'' = -(G/L) sin(theta)`` — per trajectory, regress the
    second difference on sin(theta): slope = -G/L. No latent ground
    truth anywhere; inputs are the observed frames only.

    Returns ``(th, om, L_hat)``: (n, T) angles, (n, T) angular
    velocities, (n,) length estimates (clipped to [0.25, 4]; fallback
    1.5 when the residual slope is unphysical — e.g. a trajectory
    pinned near theta = 0 where sin(theta) carries no signal).
    """
    th = pixel_angles(x, h, w)
    om = np.gradient(th, dt, axis=1)
    acc = np.gradient(om, dt, axis=1)
    # drop the one-sided boundary stencils of np.gradient
    s, a = np.sin(th[:, 2:-2]), acc[:, 2:-2]
    slope = (s * a).sum(axis=1) / np.maximum((s * s).sum(axis=1), 1e-9)
    L = np.where(slope < -1e-3, -G / np.minimum(slope, -1e-3), 1.5)
    L = np.clip(L, 0.25, 4.0)
    return (th.astype(np.float32), om.astype(np.float32),
            L.astype(np.float32))


def warm_start_pendulum(model, train_x, dt: float, *, window: int = 50,
                        offsets=(0, 25, 50), steps: int = 300,
                        lr: float = 1e-3, estimates=None,
                        logvar_target: float = -6.0,
                        logvar_weight: float = 0.1):
    """Warm-start a GOKU pendulum model from the pixel readout
    (train.latent_warm_start with this domain's targets — the flagship
    application VERDICT r4 named): regress the deterministic
    encode -> latent_out path onto (theta, omega) at each window start
    and the residual-estimated L, plus the measured logvar-calming term
    (fresh logvar heads emit O(1) values whose sigma ~ 1-3 reparam noise
    kicks training out of a warm basin — RESULTS.md round-4 Kuramoto).

    ``offsets``: window start frames — several offsets teach the encoder
    the readout at any phase of the swing, not just t=0. vmap-compatible
    (population warm start: ``MultiSeedTrainer.warm_start``). Pass
    ``estimates=pendulum_pixel_estimates(train_x, dt)`` to reuse the
    host-side readout across replicas/calls.

    Returns ``(warm_model, losses)`` like latent_warm_start.
    """
    import jax.numpy as jnp
    from latentdiffeq.train import latent_warm_start

    th, om, L = (estimates if estimates is not None
                 else pendulum_pixel_estimates(train_x, dt))
    x = np.asarray(train_x)
    xs, z0s = [], []
    for s in offsets:
        xs.append(x[:, s:s + window])
        z0s.append(np.stack([th[:, s], om[:, s]], axis=1))
    xb = jnp.asarray(np.concatenate(xs, 0))
    z0t = jnp.asarray(np.concatenate(z0s, 0).astype(np.float32))
    Lt = jnp.asarray(np.tile(L, len(offsets)).astype(np.float32))

    def loss_fn(l_hat, mu, logvar):
        z0_hat, th_hat = l_hat
        l_z0 = jnp.mean((z0_hat.astype(jnp.float32) - z0t) ** 2)
        l_L = jnp.mean((th_hat[:, 0].astype(jnp.float32) - Lt) ** 2)
        l_lv = sum(jnp.mean((lv.astype(jnp.float32)
                             - logvar_target) ** 2) for lv in logvar)
        return l_z0 + l_L + logvar_weight * l_lv

    return latent_warm_start(model, xb, loss_fn, steps=steps, lr=lr,
                             with_moments=True)


def pixel_angle_corr(model, val_set, th_obs: np.ndarray,
                     dt: float) -> float:
    """Median per-trajectory |Pearson| between the model's decoded latent
    angle and the pixel-read angle (chart sign resolved by the median, as
    in quality_goku.evaluate)."""
    x = jnp.asarray(val_set)
    t = jnp.arange(x.shape[1], dtype=jnp.float32) * dt

    @jax.jit
    def ztraj(m, xv):
        mu, _ = m.encoder(xv)
        (_, z, _), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return z

    z = np.asarray(ztraj(model, x), dtype=np.float64)
    r = pearson_rows(z[:, :, 0], th_obs[:, :z.shape[1]])
    sign = float(np.sign(np.median(r))) or 1.0
    return float(np.median(sign * r))


def pixel_forecast_corr(model, val_set, th_obs: np.ndarray, dt: float,
                        ctx: int) -> float:
    """Median per-trajectory Pearson between the model's FORECAST latent
    angle and the pixel-read angle on the frames the encoder never saw.

    Encodes only ``val_set[:, :ctx]``, integrates the inferred dynamics
    over the full horizon, and scores z[:, ctx:, 0] against
    ``th_obs[:, ctx:]`` (chart sign resolved on the full horizon, as in
    benchmarks/forecast_quality.py). Observations only — the beyond-window
    frames are data the user has, just frames the ENCODER never reads —
    so this is a valid unsupervised selector for extrapolation quality,
    which the in-context pixel score is measurably blind to
    (benchmarks/RESULTS.md forecast-quality table: in-context gate
    passers span 0.29-0.83 beyond-window)."""
    x = jnp.asarray(val_set)
    t = jnp.arange(x.shape[1], dtype=jnp.float32) * dt

    @jax.jit
    def ztraj(m, xc):
        mu, _ = m.encoder(xc)
        (_, z, _), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return z

    z = np.asarray(ztraj(model, x[:, :ctx]), dtype=np.float64)
    return _forecast_score(z, th_obs, ctx)


def _forecast_score(z: np.ndarray, th_obs: np.ndarray, ctx: int) -> float:
    """Shared scoring: sign gauge from the full horizon, score beyond."""
    T = z.shape[1]
    r_full = pearson_rows(z[:, :, 0], th_obs[:, :T])
    med = np.median(r_full)
    if not np.isfinite(med):
        return -np.inf
    sign = float(np.sign(med)) or 1.0
    r_beyond = sign * pearson_rows(z[:, ctx:, 0], th_obs[:, ctx:T])
    out = float(np.median(r_beyond))
    return out if np.isfinite(out) else -np.inf


@jax.jit
def _pop_forecast_ztraj(models, x_ctx, t_full):
    """Forecast latent trajectories for a seed-stacked population: encode
    the context window only, decode over the full horizon — one compiled
    vmap over the seed axis."""
    def one(m):
        mu, _ = m.encoder(x_ctx)
        (_, z, _), _ = m.decoder(mu, t_full, key=jax.random.PRNGKey(0))
        return z

    return jax.vmap(one)(models)


def population_pixel_forecast_scores(models_stacked, val_set,
                                     th_obs: np.ndarray, dt: float,
                                     ctx: int) -> np.ndarray:
    """(S,) ``pixel_forecast_corr`` for every replica of a seed-stacked
    population in one jitted forward — the forecast-selection score_fn
    for ``MultiSeedTrainer.select``. Non-finite replicas score -inf."""
    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt
    z = np.asarray(_pop_forecast_ztraj(models_stacked, xv[:, :ctx], t),
                   np.float64)
    return np.asarray([_forecast_score(zs, th_obs, ctx) for zs in z])


def population_pixel_composite_scores(models_stacked, val_set,
                                      th_obs: np.ndarray, dt: float,
                                      ctx: int,
                                      incontext_bar: float = 0.95
                                      ) -> np.ndarray:
    """(S,) composite selection score: pixel-FORECAST corr among replicas
    whose in-context pixel corr clears ``incontext_bar``; replicas below
    the bar rank strictly lower, ordered by in-context progress.

    Measured rationale (benchmarks/RESULTS.md round-3 forecast section):
    gating/selecting on beyond-context correlation ALONE is gameable
    early in training — at epoch 100 a replica already tracks the
    beyond-window phase at corr 0.85 while its in-context length error is
    still 0.35 (7x the gate) — so extrapolation-quality selection must be
    conditioned on in-context identification. Passing replicas score
    1 + forecast (in [0, 2]); failing replicas score incontext - 1
    (< incontext_bar - 1 <= 0); diverged replicas -inf."""
    in_ctx = population_pixel_scores(models_stacked, val_set, th_obs, dt)
    fc = population_pixel_forecast_scores(models_stacked, val_set, th_obs,
                                          dt, ctx)
    return composite_scores(in_ctx, fc, incontext_bar)


def composite_scores(in_ctx: np.ndarray, fc: np.ndarray,
                     incontext_bar: float = 0.95) -> np.ndarray:
    """Combination law of the composite selector (see
    population_pixel_composite_scores): bar-passing replicas with a FINITE
    forecast score 1 + forecast (in [0, 2]); everything else falls back to
    in_ctx - 1 (< incontext_bar - 1 <= 0, so no fallback replica ever beats
    a true composite passer); non-finite in_ctx (diverged decode) is -inf.

    The finite-forecast condition matters: a replica can clear the
    in-context bar while its beyond-window trajectory diverges (fc = -inf,
    e.g. a theta-hat that blows up past the training span). Such a replica
    must not win a forecast selection, but its in-context identification is
    real — so it ranks by in-context progress among the non-passers instead
    of below even collapsed replicas (1 + (-inf) would)."""
    in_ctx = np.asarray(in_ctx, np.float64)
    fc = np.asarray(fc, np.float64)
    out = np.where((in_ctx >= incontext_bar) & np.isfinite(fc),
                   1.0 + fc, in_ctx - 1.0)
    return np.where(np.isfinite(in_ctx), out, -np.inf)


@jax.jit
def _pop_ztraj(models, xv, t):
    """Decoded latent trajectories for a seed-stacked population: one
    compiled vmap over the seed axis (looping seed_model() instead pays
    one compile per replica per call)."""
    def one(m):
        mu, _ = m.encoder(xv)
        (_, z, _), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return z

    return jax.vmap(one)(models)


def population_pixel_scores(models_stacked, val_set, th_obs: np.ndarray,
                            dt: float) -> np.ndarray:
    """(S,) pixel_angle_corr for every replica of a seed-stacked
    population (MultiSeedTrainer.models / .stacked_best_models) in one
    jitted forward. Same protocol as pixel_angle_corr: median
    per-trajectory Pearson vs the pixel-read angle, chart sign resolved
    by the median; uses observations only — valid for unsupervised
    pruning and winner selection (pass as the score_fn of
    ``MultiSeedTrainer.select``)."""
    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt
    z = np.asarray(_pop_ztraj(models_stacked, xv, t), np.float64)
    out = []
    for zs in z:
        r = pearson_rows(zs[:, :, 0], th_obs[:, :zs.shape[1]])
        med = np.median(r)
        if not np.isfinite(med):  # diverged replica: must lose the argmax
            out.append(-np.inf)
            continue
        sign = float(np.sign(med)) or 1.0
        out.append(float(np.median(sign * r)))
    return np.asarray(out)
