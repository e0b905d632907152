"""Model template tests: shapes, dispatch, default architectures, failure
propagation, SDE/NODE/augmented variants."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))

from pendulum import Pendulum, PendulumFriction, SPendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.core import tree_size  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentODE, LatentDiffEqModel,  # noqa: E402
                                 NODE, default_layers)

OPTS = make_options(adaptive=False, substeps=1)
B, T, D = 3, 12, 48
T_GRID = jnp.arange(T, dtype=jnp.float32) * 0.05


def _goku_model(diffeq=None, input_dim=D):
    diffeq = diffeq or Pendulum(options=OPTS)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), input_dim,
                              diffeq, hidden_dim_resnet=32,
                              latent_to_diffeq_dim=32)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def _lode_model(augment_dim=0, input_dim=D):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    diffeq = NODE(k1, 8, hidden_dim=32, augment_dim=augment_dim,
                  options=OPTS)
    enc, dec = default_layers(k2, LatentODE(), input_dim, diffeq,
                              hidden_dim_resnet=32)
    return LatentDiffEqModel.build(LatentODE(), enc, dec)


def test_goku_forward_shapes():
    model = _goku_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    (x_hat, z_hat, l_hat), mu, logvar, aux = model(x, T_GRID)
    assert x_hat.shape == (B, T, D)
    assert z_hat.shape == (B, T, 2)          # pendulum z_dim = 2
    z0_hat, th_hat = l_hat
    assert z0_hat.shape == (B, 2) and th_hat.shape == (B, 1)
    (z0_mu, th_mu), (z0_lv, th_lv) = mu, logvar
    assert z0_mu.shape == (B, 16) and th_mu.shape == (B, 16)
    assert bool(jnp.all(aux["success"]))
    assert float(jnp.min(th_hat)) > 0.0      # softplus head (GOKU.jl:203)
    assert float(jnp.min(x_hat)) >= 0.0 and float(jnp.max(x_hat)) <= 1.0


def test_goku_variational_needs_key_and_is_reproducible():
    model = _goku_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    with pytest.raises(ValueError):
        model(x, T_GRID, variational=True)
    k = jax.random.PRNGKey(7)
    out1 = model(x, T_GRID, variational=True, key=k)
    out2 = model(x, T_GRID, variational=True, key=k)
    np.testing.assert_array_equal(np.asarray(out1[0][0]),
                                  np.asarray(out2[0][0]))
    out3 = model(x, T_GRID, variational=True, key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(out1[0][0]), np.asarray(out3[0][0]))


def test_goku_deterministic_equals_mu_path():
    """variational=False must decode the posterior mean
    (LatentDiffEqModel.jl:31)."""
    model = _goku_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    (_, _, l_hat), mu, _, _ = model(x, T_GRID)
    z0_mu, th_mu = mu
    z0_direct = model.decoder.latent_out[0](z0_mu)
    np.testing.assert_allclose(np.asarray(l_hat[0]), np.asarray(z0_direct),
                               rtol=1e-5)


def test_goku_friction_and_sde_variants():
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    m_f = _goku_model(PendulumFriction(options=OPTS))
    (x_hat, _, _), _, _, aux = m_f(x, T_GRID)
    assert bool(jnp.all(aux["success"]))

    m_s = _goku_model(SPendulum())
    (x_hat, z_hat, _), _, _, aux = m_s(x, T_GRID, variational=True,
                                       key=jax.random.PRNGKey(2))
    assert z_hat.shape == (B, T, 2)
    assert bool(jnp.all(aux["success"]))
    with pytest.raises(ValueError):
        m_s(x, T_GRID)  # SDE needs a key even non-variationally


@pytest.mark.slow
def test_goku_sde_adaptive_forward_and_grad():
    """Adaptive SDE dispatch from the model path (the reference's SOSRI()
    semantics, pendulum.jl:103 via GOKU.jl:121): forward succeeds, tracks
    the fixed-grid solve on the SAME Brownian path, and is differentiable.
    """
    from latentdiffeq.solve.sde import SDEAdaptiveConfig
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    key = jax.random.PRNGKey(2)
    cfg = SDEAdaptiveConfig(rtol=1e-2, atol=1e-4, max_steps=256,
                            depth_cap=6)
    m_ad = _goku_model(SPendulum(adaptive=True, adaptive_cfg=cfg))
    m_fg = _goku_model(SPendulum(substeps=4))

    (x_ad, z_ad, _), _, _, aux_ad = m_ad(x, T_GRID, key=key)
    assert z_ad.shape == (B, T, 2)
    assert bool(jnp.all(aux_ad["success"]))
    # adaptive steps consume the same virtual-Brownian-tree path as the
    # fixed grid, so the latent trajectories must agree to solve tolerance
    (_, z_fg, _), _, _, aux_fg = m_fg(x, T_GRID, key=key)
    assert bool(jnp.all(aux_fg["success"]))
    np.testing.assert_allclose(np.asarray(z_ad), np.asarray(z_fg),
                               atol=5e-3)

    def loss(m):
        (xh, _, _), _, _, _ = m(x, T_GRID, key=key)
        return jnp.mean((xh - x) ** 2)

    grads = jax.grad(loss)(m_ad)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_latent_ode_forward_shapes():
    model = _lode_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    (x_hat, z_hat, l_hat), mu, logvar, aux = model(x, T_GRID)
    assert x_hat.shape == (B, T, D)
    assert z_hat.shape == (B, T, 8)
    assert mu.shape == (B, 8) and logvar.shape == (B, 8)
    assert bool(jnp.all(aux["success"]))


def test_latent_ode_augmented():
    model = _lode_model(augment_dim=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    (x_hat, z_hat, _), _, _, _ = model(x, T_GRID)
    assert z_hat.shape == (B, T, 12)  # 8 + 4 (reference: LatentODE.jl:72)
    assert x_hat.shape == (B, T, D)


def test_latent_ode_dudt_params_receive_grads():
    model = _lode_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))

    def loss(m):
        (x_hat, _, _), _, _, _ = m(x, T_GRID)
        return jnp.mean((x - x_hat) ** 2)

    g = jax.grad(loss)(model)
    dudt_g = g.decoder.diffeq.dudt
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(dudt_g))
    assert total > 0.0


def test_goku_mechanistic_diffeq_has_no_trainable_leaves():
    """The mechanistic ODE spec must contribute zero parameters — the
    reference's prototype u0/p are placeholders, not weights."""
    model = _goku_model()
    assert tree_size(model.decoder.diffeq) == 0


def test_default_dims_match_reference():
    """Full-size default architecture dims (reference: GOKU.jl:199-205)."""
    diffeq = Pendulum(options=OPTS)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 784,
                              diffeq)
    fe, pe, li = enc
    assert fe[0].W.shape == (784, 200)
    assert fe[-1].W.shape == (200, 32)
    pe_z0, pe_f, pe_b = pe
    assert pe_z0.cells[0].Wi.shape == (32, 16)
    assert pe_f.cells[0].Wi.shape == (32, 4 * 16)   # LSTM gates
    assert li[0].W.shape == (16, 16)
    assert li[2].W.shape == (32, 16)                # bidirectional concat
    lo, de, re = dec
    assert lo[0][0].W.shape == (16, 200) and lo[0][1].W.shape == (200, 2)
    assert lo[1][1].W.shape == (200, 1)
    assert re[0].W.shape == (2, 200) and re[-1].W.shape == (200, 784)


def test_transform_after_diffeq_hook():
    import dataclasses
    diffeq = Pendulum(options=OPTS)
    diffeq_t = dataclasses.replace(diffeq, transform=lambda z: jnp.sin(z))
    m1 = _goku_model(diffeq)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), D,
                              diffeq_t, hidden_dim_resnet=32,
                              latent_to_diffeq_dim=32)
    m2 = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    (_, z1, _), _, _, _ = m1(x, T_GRID)
    (_, z2, _), _, _, _ = m2(x, T_GRID)
    np.testing.assert_allclose(np.asarray(jnp.sin(z1)), np.asarray(z2),
                               rtol=1e-5, atol=1e-6)


def test_whole_model_is_jittable_and_differentiable():
    model = _goku_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))

    @jax.jit
    def loss(m, key):
        (x_hat, _, _), mu, logvar, _ = m(x, T_GRID, variational=True,
                                         key=key)
        from latentdiffeq.train import vector_kl, vector_mse
        return vector_mse(x, x_hat) + 0.5 * vector_kl(mu, logvar)

    g = jax.jit(jax.grad(loss))(model, jax.random.PRNGKey(3))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert tree_size(g) == tree_size(model)


def test_kuramoto_transform_trains_end_to_end():
    """User-defined mechanistic dynamics with transform_after_diffeq
    (Kuramoto phases observed through sin) train end to end."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "custom_dynamics"))
    from custom import Kuramoto
    from latentdiffeq.train import TrainConfig, Trainer

    kur = Kuramoto(n_oscillators=4, options=OPTS)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 12, kur,
                              hidden_dim_resnet=16, latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 15, 12))
    (x_hat, z_hat, _), _, _, aux = model(x, jnp.arange(15.0) * 0.1)
    assert z_hat.shape == (6, 15, 4)
    assert float(jnp.max(jnp.abs(z_hat))) <= 1.0 + 1e-5  # sin-transformed

    cfg = TrainConfig(batch_size=4, seq_len=10, epochs=4, dt=0.1, seed=0,
                      epochs_per_dispatch=2, save_best=False)
    tr = Trainer(model, cfg)
    hist = tr.fit(np.asarray(x[:4]), np.asarray(x[4:]), verbose=False)
    assert np.isfinite(hist[-1]["train_loss"])


def test_forecast_extrapolates_beyond_context():
    """forecast(): encode a short context, decode over a longer grid."""
    model = _goku_model()
    x_ctx = jax.random.uniform(jax.random.PRNGKey(1), (B, 8, D))
    t_long = jnp.arange(20, dtype=jnp.float32) * 0.05
    x_hat, z_hat, l_hat = model.forecast(x_ctx, t_long)
    assert x_hat.shape == (B, 20, D)
    assert z_hat.shape == (B, 20, 2)
    assert np.all(np.isfinite(np.asarray(x_hat)))


@pytest.mark.slow
def test_bfloat16_mixed_precision_trains():
    """bf16 NN layers with f32 solve: forward dtype preserved, training
    step finite (the MXU-native configuration)."""
    from latentdiffeq.train import TrainConfig, Trainer

    diffeq = Pendulum(options=OPTS)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 24,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16,
                              dtype=jnp.bfloat16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 10, 24),
                           dtype=jnp.bfloat16)
    t = jnp.arange(10, dtype=jnp.float32) * 0.05
    (x_hat, z_hat, _), mu, logvar, aux = model(x, t)
    assert x_hat.dtype == jnp.bfloat16
    assert z_hat.dtype == jnp.bfloat16
    assert bool(jnp.all(aux["success"]))

    cfg = TrainConfig(batch_size=4, seq_len=8, epochs=3, seed=0,
                      epochs_per_dispatch=3, save_best=False)
    tr = Trainer(model, cfg)
    hist = tr.fit(np.asarray(x, dtype=np.float32),
                  np.asarray(x, dtype=np.float32), verbose=False)
    assert np.isfinite(hist[-1]["train_loss"])


def test_goku_sde_sosri_multiplicative_forward_and_grad():
    """A user-defined MULTIPLICATIVE-noise SDE through the model path with
    the diagonal-noise SRI solver (``SDEDynamics(solver=SOSRI())`` — the
    reference's actual SOSRI() noise class, pendulum.jl:103): adaptive
    forward succeeds, tracks a fine fixed-grid solve of the SAME Brownian
    path, and the whole model is differentiable through it."""
    from latentdiffeq import SOSRI
    from latentdiffeq.models import SDEDynamics
    from latentdiffeq.solve.sde import SDEAdaptiveConfig
    from pendulum import _pendulum_f

    def g_mult(u, p, t):
        return 0.05 * u  # state-dependent: outside SRA1's additive contract

    def spec(**kw):
        return SDEDynamics(f=_pendulum_f, g=g_mult, z_dim=2, theta_dim=1,
                           solver=SOSRI(), **kw)

    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, D))
    key = jax.random.PRNGKey(2)
    cfg = SDEAdaptiveConfig(rtol=1e-2, atol=1e-2, max_steps=256,
                            depth_cap=6)
    m_ad = _goku_model(spec(adaptive=True, adaptive_cfg=cfg))
    m_fg = _goku_model(spec(substeps=8))

    (x_ad, z_ad, _), _, _, aux_ad = m_ad(x, T_GRID, key=key)
    assert z_ad.shape == (B, T, 2)
    assert bool(jnp.all(aux_ad["success"]))
    (_, z_fg, _), _, _, aux_fg = m_fg(x, T_GRID, key=key)
    assert bool(jnp.all(aux_fg["success"]))
    np.testing.assert_allclose(np.asarray(z_ad), np.asarray(z_fg),
                               atol=5e-3)

    def loss(m):
        (xh, _, _), _, _, _ = m(x, T_GRID, key=key)
        return jnp.mean((xh - x) ** 2)

    grads = jax.grad(loss)(m_ad)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_kuramoto_identifiability_mechanism():
    """The measured mechanism behind the Kuramoto campaign's chart metric
    (benchmarks/RESULTS.md round-4 Kuramoto section), pinned as physics:

    - identical natural frequencies (omega_spread=0): oscillators
      phase-lock EXACTLY for any K > 0, so after the transient ANY
      permutation of the initial phases produces the same sin-observation
      trajectory — the latent oscillator assignment is structurally
      non-identifiable from late-window data;
    - omega_spread > 0 (the classic Kuramoto setting): each latent slot
      has its own fixed natural frequency, so permuted initial phases
      produce measurably different trajectories — the permutation gauge
      is broken by the dynamics spec itself.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "custom_dynamics"))
    import custom as custom_mod
    from latentdiffeq import ODEProblem, make_options, solve

    n = 5
    u0 = jnp.array([0.1, 1.3, -2.0, 2.4, -0.7])
    perm = jnp.array([2, 0, 4, 1, 3])
    p = jnp.array([2.0, 1.5])            # omega, K (well above locking)
    saveat = jnp.arange(120, dtype=jnp.float32) * 0.1
    opts = make_options(adaptive=False, substeps=4)

    def tail_gap(spread):
        kur = custom_mod.Kuramoto(n_oscillators=n, options=opts,
                                  omega_spread=spread)
        def run(u):
            prob = ODEProblem(f=kur.f, u0=u, tspan=(0.0, 11.9), p=p)
            ys = solve(prob, kur.solver, saveat=saveat, substeps=4).ys
            return jnp.sin(ys)
        a, b = run(u0), run(u0[perm])
        # compare the observation SETS in the window tail (post-sync):
        # sort oscillators per frame so the comparison is permutation-free
        tail_a = jnp.sort(a[-20:], axis=1)
        tail_b = jnp.sort(b[-20:], axis=1)
        return float(jnp.max(jnp.abs(tail_a - tail_b)))

    # identical frequencies: the synced tails coincide (all oscillators
    # collapse onto ONE phase, so even the sorted sets are degenerate;
    # residual ~3e-3 is the not-yet-fully-decayed transient at t=12/K=1.5)
    gap_eq, gap_spread = tail_gap(0.0), tail_gap(0.5)
    assert gap_eq < 0.01, gap_eq
    # spread: the locked state keeps per-oscillator phase offsets ordered
    # by delta_i — permuting initial phases cannot erase them (measured
    # ~1.9 vs ~0.003: three orders of magnitude of identifiability)
    assert gap_spread > 100 * gap_eq, (gap_eq, gap_spread)

    # and the spread field really is per-oscillator: at K=0 the drift is
    # omega + delta_i, all distinct
    kur_s = custom_mod.Kuramoto(n_oscillators=n, options=opts,
                                omega_spread=0.5)
    f0 = kur_s.f(jnp.zeros(n), jnp.array([2.0, 0.0]), 0.0)
    assert len(set(np.round(np.asarray(f0), 6).tolist())) == n
