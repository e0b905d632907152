"""MultiSeedTrainer: vmapped population training == S independent Trainer
runs (same init, shuffles, RNG tapes), with argmin-val selection."""
import dataclasses
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
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                Trainer)

D = 32
SEEDS = [3, 5]


def _init_fn(key):
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(key, GOKUBasic(), D, diffeq,
                              hidden_dim_resnet=16, latent_to_diffeq_dim=16)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def _data():
    rng = np.random.default_rng(0)
    x = rng.random((16, 12, D), dtype=np.float32)
    return x, x[:3]


def _cfg(**kw):
    base = dict(batch_size=8, seq_len=8, epochs=4, seed=0,
                epochs_per_dispatch=2, save_best=False, n_cycle=1,
                start_beta=0.5, end_beta=0.5)
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.slow
def test_multiseed_matches_independent_trainers():
    """Each replica's per-epoch val-loss history equals its own
    single-seed Trainer run — population training changes the schedule of
    nothing, only the packing."""
    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms.fit(x, v, verbose=False)
    stacked_val = np.stack([rec["val_loss"] for rec in ms.history])  # (E,S)

    for j, s in enumerate(SEEDS):
        tr = Trainer(_init_fn(jax.random.PRNGKey(s)), _cfg(seed=s))
        hist = tr.fit(x, v, verbose=False)
        solo = np.array([h["val_loss"] for h in hist])
        np.testing.assert_allclose(stacked_val[:, j], solo, rtol=2e-4,
                                   atol=1e-5)
        # best tracking agrees too
        np.testing.assert_allclose(
            float(jax.device_get(ms._best["val"])[j]),
            tr.best_val_loss, rtol=2e-4)


def test_multiseed_best_selection_and_extraction():
    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms.fit(x, v, verbose=False)
    bv = jax.device_get(ms._best["val"])
    assert ms.best_seed_index == int(np.argmin(bv))
    assert ms.best_seed == SEEDS[ms.best_seed_index]
    np.testing.assert_allclose(ms.per_seed_best_vals, np.asarray(bv))
    # unstacked best model has single-model shapes and runs
    best = ms.best_model
    ref = _init_fn(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(best),
                    jax.tree_util.tree_leaves(ref)):
        assert jnp.shape(a) == jnp.shape(b)


def test_multiseed_checkpoint_loads_into_trainer(tmp_path):
    """save_best writes a Trainer-compatible checkpoint of the winning
    replica."""
    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms.fit(x, v, verbose=False)
    path = str(tmp_path / "best.npz")
    ms.save_best(path)

    tr = Trainer(_init_fn(jax.random.PRNGKey(0)), _cfg())
    tr.restore(path)
    np.testing.assert_allclose(tr.best_val_loss, ms.best_val_loss,
                               rtol=1e-6)
    # restored weights == the winning replica's best weights
    for a, b in zip(jax.tree_util.tree_leaves(tr.model),
                    jax.tree_util.tree_leaves(ms.best_model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_multiseed_select_by_score_fn(tmp_path):
    """select(): generic population winner by a user score (higher =
    better) over live AND best-carry weights, with non-finite scores
    losing; save_replica() persists the picked replica Trainer-compatibly
    (the library form of the measured pixel-observable selection)."""
    import pytest

    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms.fit(x, v, verbose=False)

    # deterministic scorer: pick index 1 regardless of val loss
    model, info = ms.select(lambda m: np.array([0.1, 0.9]))
    assert info["index"] == 1 and info["seed"] == SEEDS[1]
    # identical live/best scores tie toward the best carry
    assert info["from_best"]
    for a, b in zip(jax.tree_util.tree_leaves(model),
                    jax.tree_util.tree_leaves(ms.best_seed_model(1))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a scorer that actually reads the weights: argmax can land on a LIVE
    # replica that best-val never carried
    leaf0 = lambda m: jax.tree_util.tree_leaves(m)[0]  # noqa: E731
    live = np.asarray(leaf0(ms.models))
    best = np.asarray(leaf0(ms._best["model"]))

    def live_detector(stacked):
        # 1.0 only for the LIVE weights of replicas whose best carry is
        # an earlier (different) step — so the best-carry call scores 0
        got = np.asarray(leaf0(stacked))
        return np.array([
            1.0 if (np.allclose(g, l) and not np.allclose(g, b)) else 0.0
            for g, l, b in zip(got, live, best)])

    if not all(np.allclose(l, b) for l, b in zip(live, best)):
        model, info = ms.select(live_detector)
        assert not info["from_best"]
        i = info["index"]
        np.testing.assert_array_equal(np.asarray(leaf0(model)), live[i])

    # non-finite scores lose even when largest
    _, info = ms.select(lambda m: np.array([np.nan, 0.2]))
    assert info["index"] == 1

    # wrong shape is a loud error
    with pytest.raises(ValueError):
        ms.select(lambda m: np.zeros(3))

    # save_replica(live) round-trips the live weights into a Trainer
    path = str(tmp_path / "sel.npz")
    ms.save_replica(path, 1, from_best=False)
    tr = Trainer(_init_fn(jax.random.PRNGKey(0)), _cfg())
    tr.restore(path)
    for a, b in zip(jax.tree_util.tree_leaves(tr.model),
                    jax.tree_util.tree_leaves(ms.seed_model(1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.slow
def test_multiseed_progressive_curriculum_blocks():
    """Curriculum boundaries split blocks exactly as in Trainer.fit."""
    x, v = _data()
    cfg = _cfg(progressive_training=True, prog_training_duration=2,
               start_seq_len=4, prog_seq_len_step=None, epochs=4)
    ms = MultiSeedTrainer(_init_fn, cfg, SEEDS)
    ms.fit(x, v, verbose=False)
    seqs = [rec["seq_len"] for rec in ms.history]
    assert seqs == [4, 8, 8, 8]
    assert all(np.isfinite(rec["val_loss"]).all() for rec in ms.history)


@pytest.mark.slow
def test_multiseed_population_parallel_mesh():
    """Population parallelism: sharding the seed axis over the 8-device
    mesh gives the same training as the unsharded population (the seed
    axis is embarrassingly parallel — no collectives), with replicas
    actually spread across all devices."""
    from latentdiffeq.parallel import make_mesh

    mesh = make_mesh(8)
    x, v = _data()
    seeds = list(range(3, 11))  # 8 seeds, one per device
    ms_ref = MultiSeedTrainer(_init_fn, _cfg(), seeds)
    ms_ref.fit(x, v, verbose=False)
    ms_par = MultiSeedTrainer(_init_fn, _cfg(), seeds, mesh=mesh)
    ms_par.fit(x, v, verbose=False)

    # replicas spread across all 8 devices
    leaf = jax.tree_util.tree_leaves(ms_par.models)[0]
    assert len(leaf.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(jax.device_get(ms_par._best["val"])),
        np.asarray(jax.device_get(ms_ref._best["val"])), rtol=2e-4,
        atol=1e-5)
    assert ms_par.best_seed == ms_ref.best_seed
    # winner extraction works from sharded state
    for a, b in zip(jax.tree_util.tree_leaves(ms_par.best_model),
                    jax.tree_util.tree_leaves(ms_ref.best_model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_multiseed_mesh_divisibility_check():
    from latentdiffeq.parallel import make_mesh
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        MultiSeedTrainer(_init_fn, _cfg(), [1, 2, 3], mesh=make_mesh(8))


@pytest.mark.slow
def test_multiseed_population_resume_equals_uninterrupted(tmp_path):
    """Interrupt a population run mid-way, save_population, restore into a
    fresh trainer, continue — final state equals the uninterrupted run
    (same shuffles, key chains, best carry; bitwise-deterministic on one
    device, compared to f32 rounding)."""
    x, v = _data()
    ms_full = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms_full.fit(x, v, verbose=False)

    ms_a = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms_a.fit(x, v, epochs=2, verbose=False)
    path = str(tmp_path / "population.npz")
    ms_a.save_population(path)

    ms_b = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms_b.restore(path)
    assert ms_b.epoch == 2
    ms_b.fit(x, v, verbose=False)   # continues to cfg.epochs = 4

    np.testing.assert_allclose(
        np.asarray(jax.device_get(ms_b._best["val"])),
        np.asarray(jax.device_get(ms_full._best["val"])),
        rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(ms_b.models),
                    jax.tree_util.tree_leaves(ms_full.models)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # seed mismatch fails loudly
    import pytest
    ms_c = MultiSeedTrainer(_init_fn, _cfg(), [7, 9])
    with pytest.raises(ValueError, match="seeds"):
        ms_c.restore(path)


@pytest.mark.slow
def test_multiseed_prune_continues_survivors(tmp_path):
    """Pruning replicas mid-run leaves the survivors' training untouched:
    a 3-seed run pruned to 2 equals the 2-seed run that never included
    the third (same tapes, shuffles, best carries)."""
    x, v = _data()
    seeds3 = [3, 5, 9]
    ms = MultiSeedTrainer(_init_fn, _cfg(), seeds3)
    ms.fit(x, v, epochs=2, verbose=False)
    ms.prune([0, 2])
    assert ms.seeds == [3, 9]
    ms.fit(x, v, verbose=False)

    ms_ref = MultiSeedTrainer(_init_fn, _cfg(), [3, 9])
    ms_ref.fit(x, v, verbose=False)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(ms._best["val"])),
        np.asarray(jax.device_get(ms_ref._best["val"])),
        rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ms.models),
                    jax.tree_util.tree_leaves(ms_ref.models)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
    import pytest
    with pytest.raises(ValueError, match="at least one"):
        ms.prune([])


def test_multiseed_nan_replica_loses_selection():
    """A diverged replica (NaN weights -> NaN losses) must not poison
    best-val tracking (NaN never enters the carry) nor win the argmin
    (regression: jnp.minimum propagated NaN and np.argmin then selected
    the diverged seed)."""
    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    # poison replica 1's weights in-place before training
    ms.models = jax.tree_util.tree_map(
        lambda a: a.at[1].set(jnp.nan * jnp.zeros_like(a[1])), ms.models)
    ms.fit(x, v, verbose=False)
    bv = np.asarray(jax.device_get(ms._best["val"]))
    assert np.isfinite(bv[0]), bv       # healthy replica tracked normally
    assert not np.isfinite(bv[1]), bv   # diverged replica never improves
    assert not np.isnan(bv[1]), bv      # ...but its best stays +inf
    assert ms.best_seed_index == 0
    assert np.isfinite(ms.best_val_loss)


def test_multiseed_elbo_rank():
    """elbo_rank returns one finite val-ELBO per live replica and is
    monotone in beta's KL weighting (beta=0 == pure reconstruction)."""
    x, v = _data()
    ms = MultiSeedTrainer(_init_fn, _cfg(), SEEDS)
    ms.fit(x, v, verbose=False)
    t = jnp.arange(v.shape[1], dtype=jnp.float32) * 0.05
    e1 = ms.elbo_rank(v, t, beta=1.0)
    e0 = ms.elbo_rank(v, t, beta=0.0)
    assert len(e1) == len(SEEDS) == len(e0)
    assert all(np.isfinite(e) for e in e1 + e0)
    # KL >= 0: the beta=1 ELBO dominates the beta=0 reconstruction
    assert all(a >= b - 1e-5 for a, b in zip(e1, e0))
