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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_mesh_mini_convergence_canary():
    """Mesh-mode twin of test_cpu_mini_convergence_canary (the DP path has
    step-equivalence tests and a 2-epoch dryrun, but nothing previously
    bound `Trainer(mesh=...)` to actual LEARNING over hundreds of epochs):
    train the same small GOKU on real pendulum video through the full
    variational path with the batch sharded over the 8-device mesh, and
    assert BOTH the absolute convergence bar and final-loss agreement with
    the single-device run (same tape — only the sharding differs; f32
    reduction-order drift over 300 chaotic epochs is the tolerance)."""
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import TrainConfig, Trainer
    from create_data import generate_dataset

    _, _, _, frames = generate_dataset(n_traj=20, seed=0,
                                       tspan=(0.0, 2.45))
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq, hidden_dim_resnet=64,
                              latent_to_diffeq_dim=64)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    def fit(mesh_arg, epochs=300):
        cfg = TrainConfig(batch_size=16, seq_len=30, epochs=epochs, seed=0,
                          start_beta=0.0, end_beta=1.0, n_cycle=1,
                          ratio=0.5, save_best=False,
                          epochs_per_dispatch=50)
        tr = Trainer(model, cfg, mesh=mesh_arg)
        hist = tr.fit(x[:16], x[16:], verbose=False)
        return tr, hist

    tr_d, hist_d = fit(make_mesh(8))
    assert hist_d[0]["train_loss"] > 100, "sanity: starts untrained"
    # the absolute learning bar (single-device canary: healthy best ~40
    # at 400 epochs; at 300 epochs measured ~45 — bar 90 keeps 2x margin)
    assert tr_d.best_val_loss < 90.0, (
        f"mesh canary failed to learn: best val {tr_d.best_val_loss:.1f}")

    tr_s, hist_s = fit(None)
    # same tape, same math — mesh vs single diverge only by f32
    # reduction order amplified over 300 epochs; they must agree on
    # where training ENDED UP, not bitwise
    assert abs(tr_d.best_val_loss - tr_s.best_val_loss) \
        <= 0.15 * tr_s.best_val_loss + 2.0, (
        tr_d.best_val_loss, tr_s.best_val_loss)
    assert abs(hist_d[-1]["train_loss"] - hist_s[-1]["train_loss"]) \
        <= 0.15 * hist_s[-1]["train_loss"] + 2.0


@pytest.mark.slow
def test_mesh_multiseed_population_learns():
    """MultiSeedTrainer(mesh=...) bound to learning (the seed axis sharded
    one-replica-per-device): a 4-seed population on a 4-device mesh must
    descend to the canary bar. Exactness (sharded == unsharded) is covered
    by test_multiseed; this pins that the sharded path actually TRAINS
    over hundreds of epochs."""
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import MultiSeedTrainer, TrainConfig
    from create_data import generate_dataset

    _, _, _, frames = generate_dataset(n_traj=20, seed=0,
                                       tspan=(0.0, 2.45))
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def init_fn(k):
        enc, dec = default_layers(k, GOKUBasic(), x.shape[-1], diffeq,
                                  hidden_dim_resnet=32,
                                  latent_to_diffeq_dim=32)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(batch_size=16, seq_len=30, epochs=200, seed=0,
                      start_beta=0.0, end_beta=1.0, n_cycle=1, ratio=0.5,
                      save_best=False, epochs_per_dispatch=50)
    ms = MultiSeedTrainer(init_fn, cfg, [0, 1, 2, 3], mesh=make_mesh(4))
    ms.fit(x[:16], x[16:], verbose=False)
    vals = np.asarray(ms.per_seed_best_vals)
    assert np.isfinite(vals).all(), vals
    # at least one tape of four must clear the (loose) learning bar
    assert vals.min() < 110.0, vals
