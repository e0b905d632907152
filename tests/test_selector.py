"""Pixel-angle extractor accuracy (examples/pendulum/pixel_observable.py,
re-exported by benchmarks/selector_probe.py).

The extractor is load-bearing: it drives unsupervised model selection and
population pruning (MultiSeedTrainer.select via train_goku.py
--select-by pixel and time_to_gate.py), so its inversion of
the renderer geometry must stay accurate if create_data.render_frame or
the selector ever changes. The dataset renders every trajectory with the
FIXED 19-px visual rod (HIGH_DIM_ARGS[0]); the physical length L enters
the dynamics only, so the extractor is tested at that geometry.
reference: examples/pendulum_friction-less/create_data.jl:90-101 (the
rendered geometry being inverted).
"""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))


@pytest.fixture(scope="module")
def rendered():
    from create_data import render_trajectory

    rng = np.random.default_rng(0)
    # Pendulum-like swings: distinct amplitudes/phases/frequencies per
    # trajectory, spanning the dataset's amplitude range.
    t = np.linspace(0.0, 4.95, 100)
    amp = rng.uniform(0.4, 1.3, size=(6, 1))
    freq = rng.uniform(1.5, 3.0, size=(6, 1))
    phase = rng.uniform(-np.pi, np.pi, size=(6, 1))
    theta = amp * np.sin(freq * t[None, :] + phase)
    frames = np.stack([
        np.asarray(render_trajectory(np.asarray(th, np.float32)))
        for th in theta
    ])
    return theta, frames.reshape(6, 100, -1)


def test_pixel_angles_absolute_accuracy(rendered):
    from pixel_observable import pixel_angles

    theta, flat = rendered
    est = pixel_angles(flat)
    err = np.abs(est - theta)
    assert err.max() < 0.06, err.max()
    assert np.median(err) < 0.02, np.median(err)


def test_pixel_angles_per_trajectory_correlation(rendered):
    from pixel_observable import pearson_rows, pixel_angles

    theta, flat = rendered
    est = pixel_angles(flat)
    r = pearson_rows(est, theta)
    assert np.min(r) > 0.999, r


def test_population_scores_match_per_model(rendered):
    """The one-compile stacked scorer (population_pixel_scores) must agree
    with the per-model pixel_angle_corr it batches."""
    import jax
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from pixel_observable import (pixel_angle_corr, pixel_angles,
                                  population_pixel_scores)

    _, flat = rendered
    th_obs = pixel_angles(flat)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def init_fn(key):
        enc, dec = default_layers(key, GOKUBasic(), flat.shape[-1], diffeq,
                                  hidden_dim_resnet=16,
                                  latent_to_diffeq_dim=16)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    keys = jnp.stack([jax.random.PRNGKey(s) for s in (3, 5)])
    stacked = jax.vmap(init_fn)(keys)
    dt = 0.05
    scores = population_pixel_scores(stacked, flat, th_obs, dt)
    singles = [
        pixel_angle_corr(
            jax.tree_util.tree_map(lambda a, i=i: a[i], stacked),
            flat, th_obs, dt)
        for i in range(2)
    ]
    np.testing.assert_allclose(scores, singles, atol=5e-5)


def test_composite_scores_combination_law():
    """Composite selection (pixel_observable.composite_scores): replicas
    clearing the in-context bar rank by forecast score and ALWAYS beat
    replicas below the bar (which rank by in-context progress); diverged
    replicas always lose. Measured rationale: beyond-context correlation
    alone is gameable early in training (RESULTS.md forecast section —
    epoch-100 phase tracking at corr 0.85 with 7x-gate length error)."""
    from pixel_observable import composite_scores

    in_ctx = np.array([0.99, 0.96, 0.94, 0.50, -np.inf])
    fc = np.array([0.60, 0.90, 0.99, 0.99, 0.99])
    s = composite_scores(in_ctx, fc, incontext_bar=0.95)
    # among bar-passers, forecast decides — the 0.96/0.90 replica wins
    assert np.argmax(s) == 1
    # every bar-passer beats every non-passer, even one with higher fc
    assert min(s[0], s[1]) > max(s[2], s[3])
    # below the bar, in-context progress orders
    assert s[2] > s[3]
    # diverged replica must lose to everything
    assert s[4] == -np.inf

    # a bar-passing replica whose FORECAST diverges (fc = -inf) falls back
    # to the in-context ordering: it can never beat a true composite
    # passer, but it still beats sub-bar replicas (its in-context
    # identification is real) and is not ranked below collapsed ones
    in_ctx2 = np.array([0.99, 0.96, 0.50, -np.inf])
    fc2 = np.array([-np.inf, 0.10, 0.99, 0.99])
    s2 = composite_scores(in_ctx2, fc2, incontext_bar=0.95)
    assert np.argmax(s2) == 1          # the finite-forecast passer wins
    assert np.isfinite(s2[0])
    assert s2[1] > s2[0] > s2[2] > s2[3]


def test_forecast_population_scores_match_per_model(rendered):
    import jax

    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from pendulum import Pendulum
    from pixel_observable import (pixel_angles, pixel_forecast_corr,
                                  population_pixel_forecast_scores)

    _, flat = rendered
    th_obs = pixel_angles(flat)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def init_fn(key):
        enc, dec = default_layers(key, GOKUBasic(), flat.shape[-1], diffeq,
                                  hidden_dim_resnet=16,
                                  latent_to_diffeq_dim=16)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    keys = jnp.stack([jax.random.PRNGKey(s) for s in (3, 5)])
    stacked = jax.vmap(init_fn)(keys)
    dt, ctx = 0.05, 50
    scores = population_pixel_forecast_scores(stacked, flat, th_obs, dt, ctx)
    singles = [
        pixel_forecast_corr(
            jax.tree_util.tree_map(lambda a, i=i: a[i], stacked),
            flat, th_obs, dt, ctx)
        for i in range(2)
    ]
    np.testing.assert_allclose(scores, singles, atol=5e-5)


# ---------------------------------------------------------------------------
# Domain-agnostic library selector (latentdiffeq.train.selectors)
# ---------------------------------------------------------------------------

def test_temporal_agreement_kills_static_predictions():
    """The property that makes the library scorer work where forecast-recon
    MSE fails (RESULTS.md selector shoot-out): a frozen/blurry temporal-mean
    prediction can WIN the MSE race but must score ~0 temporal agreement,
    while a sharp slightly-noisy prediction scores near 1."""
    from latentdiffeq.train import temporal_agreement

    rng = np.random.default_rng(0)
    t = np.linspace(0, 4 * np.pi, 60)
    # moving signal: per-"pixel" sinusoids with random phases
    phases = rng.uniform(0, 2 * np.pi, size=(1, 1, 32))
    x_true = np.sin(t[None, :, None] + phases) + 0.1  # (1, 60, 32)
    # the blurry temporal mean (what a collapsed replica decodes)
    x_static = np.repeat(x_true.mean(axis=1, keepdims=True), 60, axis=1)
    # a dynamically-correct prediction whose phase DRIFTS over the window
    # (the measured good-replica failure mode: misphased sharp rod)
    drift = 2.2 * t / t[-1]
    x_drift = np.sin(t[None, :, None] + drift[None, :, None] + phases) + 0.1

    # the blurry mean WINS the MSE race against the drifting-sharp one...
    assert (np.mean((x_static - x_true) ** 2)
            < np.mean((x_drift - x_true) ** 2))
    # ...but loses the temporal-agreement race decisively
    assert temporal_agreement(x_static, x_true) < 0.1
    assert temporal_agreement(x_drift, x_true) > 0.3
    # exact prediction = 1; NaN prediction = -inf
    assert temporal_agreement(x_true, x_true) == pytest.approx(1.0)
    x_nan = np.full_like(x_true, np.nan)
    assert temporal_agreement(x_nan, x_true) == -np.inf


def test_combine_composite_law_and_relative_bar():
    from latentdiffeq.train import combine_composite

    in_ctx = np.array([0.90, 0.89, 0.50, -np.inf, 0.895])
    fc = np.array([0.30, 0.80, 0.99, 0.99, -np.inf])
    # relative bar: max finite in_ctx (0.90) - 0.02 = 0.88 -> replicas
    # 0, 1 pass; 4 passes the bar but has -inf forecast -> fallback
    s = combine_composite(in_ctx, fc, "rel", rel_margin=0.02)
    assert np.argmax(s) == 1               # forecast decides among passers
    assert min(s[0], s[1]) > max(s[2], s[4])
    assert s[3] == -np.inf
    assert np.isfinite(s[4])
    # absolute bar: same vectors, bar 0.95 -> nobody passes, pure
    # in-context ordering among finite replicas
    s2 = combine_composite(in_ctx, fc, 0.95)
    assert np.argmax(s2) == 0
    # all-collapsed population: rel bar still returns finite ordering
    s3 = combine_composite(np.array([0.2, 0.3]), np.array([0.1, 0.2]),
                           "rel")
    assert np.argmax(s3) == 1


def test_observation_composite_scores_on_population(rendered):
    """End-to-end on a real stacked population: shapes, finiteness, and
    agreement with manually composed temporal_agreement calls."""
    import jax
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import (combine_composite,
                                    observation_composite_scores,
                                    observation_forecast_scores,
                                    temporal_agreement)
    from latentdiffeq.train.selectors import _pop_decode

    _, flat = rendered
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def init_fn(key):
        enc, dec = default_layers(key, GOKUBasic(), flat.shape[-1], diffeq,
                                  hidden_dim_resnet=16,
                                  latent_to_diffeq_dim=16)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    keys = jnp.stack([jax.random.PRNGKey(s) for s in (3, 5)])
    stacked = jax.vmap(init_fn)(keys)
    dt, ctx = 0.05, 50
    scores = observation_composite_scores(stacked, flat, dt, ctx)
    assert scores.shape == (2,)

    t = jnp.arange(flat.shape[1], dtype=jnp.float32) * dt
    xh_full = np.asarray(_pop_decode(stacked, jnp.asarray(flat), t))
    in_ctx = np.asarray([temporal_agreement(x, flat) for x in xh_full])
    fc = observation_forecast_scores(stacked, flat, dt, ctx)
    np.testing.assert_allclose(scores, combine_composite(in_ctx, fc),
                               atol=1e-12)


def test_observation_consensus_scores_mechanism(monkeypatch):
    """Cross-replica consensus (round 5, VERDICT r4 item 3): replicas
    that captured the one true dynamics agree with each other beyond
    context; idiosyncratic failures (sign flips, noise) disagree with
    everyone; non-finite replicas score -inf and are excluded from the
    partner sets. Predictions are injected via _pop_decode so the test
    pins the scoring law itself, independent of any trained model."""
    from latentdiffeq.train import selectors
    from latentdiffeq.train.selectors import observation_consensus_scores

    rng = np.random.default_rng(7)
    n, T, d = 4, 60, 3
    t = np.linspace(0.0, 3.0, T)
    truth = np.sin(t[None, :, None] * rng.uniform(1, 3, (n, 1, d)))
    goods = [truth + 0.01 * rng.normal(size=truth.shape)
             for _ in range(3)]  # the majority that captured the dynamics
    flipped = -truth  # sign-gauge failure: anti-correlated with everyone
    broken = np.full_like(truth, np.nan)
    xh = np.stack(goods + [flipped, broken])

    monkeypatch.setattr(selectors, "_pop_decode",
                        lambda models, xv, tt, key=None: jnp.asarray(xh))
    scores = observation_consensus_scores(
        models_stacked=None, val_set=truth, dt=0.05, ctx=30)

    assert scores.shape == (5,)
    # each good replica's median partner is another good replica
    assert np.all(scores[:3] > 0.9), scores
    # the flipped replica disagrees with every (good) partner
    assert scores[3] < -0.9, scores
    assert scores[4] == -np.inf, scores
    # the broken replica must not drag down the good ones' partner sets
    assert np.argmax(scores) in (0, 1, 2)

    # conditioned variant: composite law on top — good replicas that fit
    # the data keep ranking above the flipped one
    cond = observation_consensus_scores(
        models_stacked=None, val_set=truth, dt=0.05, ctx=30,
        condition_in_ctx=True)
    assert np.argmax(cond) in (0, 1, 2)
    assert cond[3] < cond[0], cond

    # S=1 population: no partners -> score 0, not a crash
    monkeypatch.setattr(selectors, "_pop_decode",
                        lambda models, xv, tt, key=None:
                        jnp.asarray(xh[:1]))
    solo = observation_consensus_scores(
        models_stacked=None, val_set=truth, dt=0.05, ctx=30)
    assert solo.shape == (1,) and solo[0] == 0.0


def test_pendulum_pixel_estimates_recover_L():
    """The round-5 warm-start targets (pendulum_pixel_estimates): on TRUE
    pendulum dynamics rendered through the real pipeline, the residual
    least squares recovers L from pixels alone (measured median err
    0.008 on the flagship val split — 6x under the 0.05 gate) and the
    angular readouts track the latents."""
    from create_data import generate_dataset
    from pendulum import Pendulum
    from pixel_observable import pendulum_pixel_estimates

    latent, u0s, ps, frames = generate_dataset(diffeq=Pendulum(), n_traj=10)
    x = np.asarray(frames).reshape(10, -1, 784)
    th, om, L = pendulum_pixel_estimates(x, 0.05)
    L_true = np.asarray(ps).reshape(-1)
    assert np.median(np.abs(L - L_true)) < 0.02, L - L_true
    true_th = np.asarray(latent)[:, :, 0]
    err = np.abs(th - true_th)
    assert np.median(err) < 0.02, np.median(err)
    true_om = np.asarray(latent)[:, :, 1]
    # finite-difference velocity: looser bar (boundary stencils)
    assert np.median(np.abs(om - true_om)) < 0.1
