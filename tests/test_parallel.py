"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))
from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.parallel import (make_dp_train_step,  # noqa: E402
                                   make_shardmap_train_step, make_mesh,
                                   replicate, shard_batch)
from latentdiffeq.train import optim  # noqa: E402

D = 32


def _setup(n_dev):
    mesh = make_mesh(n_dev)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), D, diffeq,
                              hidden_dim_resnet=16, latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    opt = optim.adamw(1e-3, decay=1e-3)
    x = np.random.default_rng(0).random((16, 16, D), dtype=np.float32)
    return mesh, model, opt, x


def test_mesh_creation():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    with pytest.raises(ValueError):
        make_mesh(16)


def test_gspmd_step_runs_and_shards():
    mesh, model, opt, x = _setup(8)
    model_r, opt_r = replicate((model, opt.init(model)), mesh)
    x_s = shard_batch(jnp.asarray(x), mesh)
    # batch axis actually sharded across all 8 devices
    assert len(x_s.sharding.device_set) == 8
    step = make_dp_train_step(opt, mesh, seq_len=8, dt=0.05)
    m, o, metrics = step(model_r, opt_r, x_s, jax.random.PRNGKey(0),
                         jnp.float32(0.3))
    assert np.isfinite(float(metrics["loss"]))
    # params replicated on every device
    leaf = jax.tree_util.tree_leaves(m)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dp_matches_single_device_exactly():
    """Deterministic data-parallel step == single-device step: gradient
    allreduce must be a pure mean, no semantic drift."""
    mesh, model, opt, x = _setup(8)
    x = jnp.asarray(x)

    # single-device reference step (same window key logic)
    from latentdiffeq.train.losses import loss_batch
    t = jnp.arange(8, dtype=jnp.float32) * 0.05
    key = jax.random.PRNGKey(0)

    def single(model, opt_state, x, key, beta):
        kwin, _ = jax.random.split(key)
        start = jax.random.randint(kwin, (), 0, x.shape[1] - 8)
        xw = jax.lax.dynamic_slice_in_dim(x, start, 8, axis=1)
        (loss, metrics), grads = jax.value_and_grad(
            lambda m: loss_batch(m, xw, t, beta, variational=False,
                                 key=None), has_aux=True)(model)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optim.apply_updates(model, updates), metrics

    m_single, met_single = single(model, opt.init(model), x, key,
                                  jnp.float32(0.3))

    model_r, opt_r = replicate((model, opt.init(model)), mesh)
    x_s = shard_batch(x, mesh)
    step = make_dp_train_step(opt, mesh, seq_len=8, dt=0.05,
                              variational=False)
    m_dp, _, met_dp = step(model_r, opt_r, x_s, key, jnp.float32(0.3))

    np.testing.assert_allclose(float(met_single["loss"]),
                               float(met_dp["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(m_single),
                    jax.tree_util.tree_leaves(m_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_shardmap_matches_gspmd():
    mesh, model, opt, x = _setup(8)
    model_r, opt_r = replicate((model, opt.init(model)), mesh)
    x_s = shard_batch(jnp.asarray(x), mesh)
    k = jax.random.PRNGKey(4)
    s1 = make_dp_train_step(opt, mesh, seq_len=8, dt=0.05,
                            variational=False)
    s2 = make_shardmap_train_step(opt, mesh, seq_len=8, dt=0.05,
                                  variational=False)
    m1, _, met1 = s1(model_r, opt_r, x_s, k, jnp.float32(0.3))
    m2, _, met2 = s2(model_r, opt_r, x_s, k, jnp.float32(0.3))
    np.testing.assert_allclose(float(met1["loss"]), float(met2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_trainer_dp_fit_matches_single_device():
    """VERDICT round-1 item 5: data parallelism integrated into the
    Trainer. A multi-epoch mesh-aware fit (block mode, best tracking, the
    full production path) must match the single-device fit numerically —
    same windows, permutations, betas, and RNG tape; only the sharding
    differs."""
    from latentdiffeq.train import TrainConfig, Trainer

    mesh, model, opt, x = _setup(8)
    tr_data, val_data = x[:8], x[8:]

    def fit(mesh_arg):
        cfg = TrainConfig(batch_size=8, seq_len=8, epochs=6, seed=0,
                          epochs_per_dispatch=3, save_best=False)
        tr = Trainer(model, cfg, optimizer=opt, mesh=mesh_arg)
        hist = tr.fit(tr_data, val_data, verbose=False)
        return tr, hist

    tr_s, hist_s = fit(None)
    tr_d, hist_d = fit(mesh)
    assert len(hist_s) == len(hist_d) == 6
    for rs, rd in zip(hist_s, hist_d):
        np.testing.assert_allclose(rs["train_loss"], rd["train_loss"],
                                   rtol=2e-4)
        np.testing.assert_allclose(rs["val_loss"], rd["val_loss"],
                                   rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(tr_s.model),
                    jax.tree_util.tree_leaves(tr_d.model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)
    # params live replicated across the whole mesh
    leaf = jax.tree_util.tree_leaves(tr_d.model)[0]
    assert len(leaf.sharding.device_set) == 8


def test_trainer_dp_batch_divisibility_validated():
    from latentdiffeq.train import TrainConfig, Trainer
    mesh, model, opt, _ = _setup(8)
    with pytest.raises(ValueError):
        Trainer(model, TrainConfig(batch_size=12), optimizer=opt, mesh=mesh)


def test_graft_entry_dryrun():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
