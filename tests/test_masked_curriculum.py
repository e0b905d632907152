"""Masked single-compile curriculum (TrainConfig.masked_curriculum).

The claim under test: threading the curriculum length through the fused
block program as a TRACED int32 (fixed shapes, wrapped-gather window,
update-masked encoder scans, cur_len-averaged loss) computes the SAME
math as the shape-sliced curriculum at every length — so the whole
seq-len ramp can run one compiled program instead of one per distinct
length. Reference curriculum being reproduced: model_train.jl:142-147
(progressive observation training).
"""
import dataclasses
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))
from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentODE, NODE,  # noqa: E402
                                 LatentDiffEqModel, default_layers)
from latentdiffeq.nn import Recurrent  # noqa: E402
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                Trainer, loss_batch)
from latentdiffeq.train.trainer import make_block_fn  # noqa: E402
from latentdiffeq.train import optim  # noqa: E402

D = 32
S = 10   # fixed buffer length
L = 6    # curriculum prefix length


def _model(key=None):
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    key = key if key is not None else jax.random.PRNGKey(7)
    enc, dec = default_layers(key, GOKUBasic(), D,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def _lode_model():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    diffeq = NODE(k1, 8, hidden_dim=16,
                  options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(k2, LatentODE(), D, diffeq,
                              hidden_dim_resnet=16)
    return LatentDiffEqModel.build(LatentODE(), enc, dec)


def _x(batch=4, T=S, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .random((batch, T, D), dtype=np.float32))


# ---------------------------------------------------------------------------
# layer level: masked scan == sliced-prefix scan
# ---------------------------------------------------------------------------
def test_recurrent_mask_equals_sliced_prefix():
    """Final state with mask t<L over an S-frame buffer equals (to f32
    rounding — the masked and sliced programs compile differently) the
    final state of running the L-frame prefix — forward (freeze after the
    prefix) and reverse (idle through the padding, then consume the
    reversed prefix), RNN and LSTM, stacked."""
    key = jax.random.PRNGKey(3)
    xs = _x()
    mask = jnp.arange(S) < L
    for net in (Recurrent.rnn(key, D, (24, 24)),
                Recurrent.lstm(key, D, (24, 24))):
        for reverse in (False, True):
            masked = net(xs, reverse=reverse, mask=mask)
            sliced = net(xs[:, :L], reverse=reverse)
            np.testing.assert_allclose(np.asarray(masked),
                                       np.asarray(sliced),
                                       rtol=2e-5, atol=1e-7)


def test_recurrent_full_mask_is_identity():
    key = jax.random.PRNGKey(4)
    xs = _x()
    net = Recurrent.lstm(key, D, (16,))
    np.testing.assert_allclose(
        np.asarray(net(xs, mask=jnp.ones(S, bool))), np.asarray(net(xs)),
        rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# model level: encoder + loss + grads
# ---------------------------------------------------------------------------
def test_encoder_cur_len_equals_sliced():
    """GOKU and LatentODE encoders: cur_len=L on the padded buffer gives
    the same (mu, logvar) as encoding the sliced prefix."""
    xs = _x()
    for model in (_model(), _lode_model()):
        mu_m, lv_m = model.encoder(xs, cur_len=jnp.int32(L))
        mu_s, lv_s = model.encoder(xs[:, :L])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            (mu_m, lv_m), (mu_s, lv_s))


def test_loss_and_grads_cur_len_equals_sliced():
    """loss_batch(cur_len=L) on the padded buffer == loss_batch on the
    sliced prefix — value and parameter gradients (fixed-grid solve, so
    the first L decoded frames are identical; the masked frames carry
    zero cotangent)."""
    model = _model()
    xs = _x()
    t_full = jnp.arange(S, dtype=jnp.float32) * 0.05
    key = jax.random.PRNGKey(11)
    beta = jnp.float32(0.7)

    def lf_masked(m):
        return loss_batch(m, xs, t_full, beta, variational=True, key=key,
                          cur_len=jnp.int32(L))[0]

    def lf_sliced(m):
        return loss_batch(m, xs[:, :L], t_full[:L], beta, variational=True,
                          key=key)[0]

    vm, gm = jax.value_and_grad(lf_masked)(model)
    vs, gs = jax.value_and_grad(lf_sliced)(model)
    np.testing.assert_allclose(float(vm), float(vs), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), gm, gs)


# ---------------------------------------------------------------------------
# block level: the fused program
# ---------------------------------------------------------------------------
def _block_inputs(cfg, n=16, T=14, E=3, val_rows=3):
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.random((n, T, D), dtype=np.float32))
    val = data[:val_rows]
    steps = n // cfg.batch_size
    idx = jnp.asarray(np.stack([
        np.random.default_rng(100 + e).permutation(n)[:steps
                                                      * cfg.batch_size]
        .reshape(steps, cfg.batch_size) for e in range(E)]))
    keys = jax.random.split(jax.random.PRNGKey(42), E)
    betas = jnp.linspace(0.0, 1.0, E, dtype=jnp.float32)
    epoch_ids = jnp.arange(E, dtype=jnp.int32)
    return data, val, idx, keys, betas, epoch_ids, steps


def _run_block(cfg, seq_len, masked, cur_lens=None):
    model = _model()
    opt = optim.adamw(1e-3, 0.9, 0.999, 1e-3)
    data, val, idx, keys, betas, epoch_ids, steps = _block_inputs(cfg)
    fn = jax.jit(make_block_fn(cfg, opt, loss_batch, seq_len, steps,
                               val.shape[1], masked=masked))
    best = {"model": model, "opt_state": opt.init(model),
            "val": jnp.float32(jnp.inf), "epoch": jnp.int32(0)}
    args = (model, opt.init(model), best, data, val, idx, keys, betas,
            epoch_ids)
    if masked:
        args += (jnp.asarray(cur_lens, jnp.int32),)
    (m, o, b), summ = fn(*args)
    return jax.device_get(m), jax.device_get(summ)


def test_masked_block_equals_sliced_block_at_short_length():
    """A masked block at fixed buffer S with cur_len=L every epoch trains
    the SAME trajectory as the shape-sliced block at seq_len=L (same
    keys, shuffles, betas): identical window draws, identical encoder
    states, identical losses/updates — to f32 rounding."""
    cfg = TrainConfig(batch_size=8, seq_len=S, dt=0.05, epochs=3,
                      save_best=False)
    E = 3
    m_masked, s_masked = _run_block(cfg, S, True, [L] * E)
    m_sliced, s_sliced = _run_block(cfg, L, False)
    np.testing.assert_allclose(s_masked["val_loss"], s_sliced["val_loss"],
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        m_masked, m_sliced)


def test_masked_block_equals_unmasked_at_full_length():
    """cur_len == seq_len reproduces the unmasked program (same randint
    draw, no wrap in the gather, all-true masks) to f32 rounding."""
    cfg = TrainConfig(batch_size=8, seq_len=S, dt=0.05, epochs=3,
                      save_best=False)
    E = 3
    m_masked, s_masked = _run_block(cfg, S, True, [S] * E)
    m_plain, s_plain = _run_block(cfg, S, False)
    np.testing.assert_allclose(s_masked["val_loss"], s_plain["val_loss"],
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        m_masked, m_plain)


# ---------------------------------------------------------------------------
# trainer level: one compile for the whole ramp
# ---------------------------------------------------------------------------
def test_trainer_masked_curriculum_single_compile():
    cfg = TrainConfig(batch_size=8, seq_len=8, epochs=6, seed=0,
                      epochs_per_dispatch=3, save_best=False,
                      progressive_training=True, prog_training_duration=4,
                      start_seq_len=4, prog_seq_len_step=1,
                      masked_curriculum=True)
    tr = Trainer(_model(), cfg)
    x = np.asarray(_x(batch=16, T=12, seed=9))
    hist = tr.fit(x, x[:3], verbose=False)
    # ONE compiled block program serves every curriculum length
    assert len(tr._epoch_cache) == 1, tr._epoch_cache.keys()
    assert [h["seq_len"] for h in hist] == [4, 5, 7, 8, 8, 8]
    assert np.isfinite([h["val_loss"] for h in hist]).all()


@pytest.mark.slow
def test_multiseed_masked_curriculum():
    cfg = TrainConfig(batch_size=8, seq_len=8, epochs=4, seed=0,
                      epochs_per_dispatch=2, save_best=False,
                      progressive_training=True, prog_training_duration=3,
                      start_seq_len=4, prog_seq_len_step=1,
                      masked_curriculum=True)
    x = np.asarray(_x(batch=16, T=12, seed=9))
    ms = MultiSeedTrainer(lambda k: _model(k), cfg, [3, 5])
    ms.fit(x, x[:3], verbose=False)
    assert len(ms._block_cache) == 1, ms._block_cache.keys()
    assert [h["seq_len"] for h in ms.history] == [4, 6, 8, 8]
    assert all(np.isfinite(h["val_loss"]).all() for h in ms.history)


def test_masked_requires_block_mode():
    cfg = TrainConfig(batch_size=8, seq_len=8, epochs=2,
                      epochs_per_dispatch=1, progressive_training=True,
                      masked_curriculum=True, save_best=False)
    tr = Trainer(_model(), cfg)
    x = np.asarray(_x(batch=16, T=12))
    try:
        tr.fit(x, x[:3], verbose=False)
    except ValueError as e:
        assert "masked_curriculum" in str(e)
    else:
        raise AssertionError("expected ValueError")
