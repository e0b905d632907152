"""Tests for losses, annealing, window sampling, optimizers, checkpointing
— golden values hand-computed from the reference formulas (SURVEY.md §4)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentdiffeq.train import (DataLoader, TrainConfig, adabelief, adam,
                                adamw, apply_updates, chain,
                                clip_by_global_norm, frange_cycle_linear,
                                kl, load_checkpoint, normalize_to_unit_segment,
                                denormalize_unit_segment, rand_time,
                                sample_window, save_checkpoint, splitobs,
                                time_loader, vector_kl, vector_mse)


def test_kl_hand_computed():
    # kl(mu, logvar) = (exp(lv) + mu^2 - lv - 1)/2 (utils.jl:16)
    assert float(kl(0.0, 0.0)) == 0.0
    np.testing.assert_allclose(float(kl(1.0, 0.0)), 0.5)
    np.testing.assert_allclose(float(kl(0.0, jnp.log(2.0))),
                               (2 - np.log(2) - 1) / 2, rtol=1e-6)


def test_vector_kl_goku_tuple():
    # sum over latent dims, mean over batch, summed over groups
    mu = (jnp.array([[1.0, 0.0], [0.0, 1.0]]),   # (batch=2, dim=2)
          jnp.array([[2.0], [0.0]]))
    lv = (jnp.zeros((2, 2)), jnp.zeros((2, 1)))
    # group1: per-sample sums: (0.5, 0.5) -> mean 0.5
    # group2: (2.0, 0.0) -> mean 1.0
    np.testing.assert_allclose(float(vector_kl(mu, lv)), 1.5, rtol=1e-6)


def test_vector_kl_free_bits_floor():
    """free_bits floors each dim's batch-mean KL; 0 reproduces the plain
    reference KL exactly."""
    from latentdiffeq.train.losses import vector_kl
    mu = jnp.array([[0.0, 2.0], [0.0, -2.0]])
    lv = jnp.zeros((2, 2))
    plain = float(vector_kl(mu, lv))
    # dim 0 KL = 0 (mu=0, var=1): floored to 0.5; dim 1 unchanged (= 2.0)
    floored = float(vector_kl(mu, lv, free_bits=0.5))
    np.testing.assert_allclose(plain, 2.0, rtol=1e-6)
    np.testing.assert_allclose(floored, 2.5, rtol=1e-6)
    # tuple (GOKU) form: floors applied per group
    both = float(vector_kl((mu, mu), (lv, lv), free_bits=0.5))
    np.testing.assert_allclose(both, 5.0, rtol=1e-6)


def test_vector_mse_reduction():
    x = jnp.ones((2, 3, 4))       # (batch, time, features)
    xh = jnp.zeros((2, 3, 4))
    # per-feature mean over (batch, time) = 1; summed over 4 features
    np.testing.assert_allclose(float(vector_mse(x, xh)), 4.0)


def test_frange_cycle_linear_hand_computed():
    L = frange_cycle_linear(10, 0.0, 1.0, 2, 0.5)
    np.testing.assert_allclose(
        L, [0.0, 0.4, 0.8, 1.0, 1.0, 0.0, 0.4, 0.8, 1.0, 1.0], atol=1e-6)


def test_frange_cycle_linear_reference_config():
    # the parity workload: 1500 epochs, 4 cycles, ratio 0.9
    L = frange_cycle_linear(1500, 0.0, 1.0, 4, 0.9)
    assert L[0] == 0.0
    assert L[-1] == 1.0
    step = 1.0 / (375 * 0.9)
    np.testing.assert_allclose(L[1], step, rtol=1e-5)
    # cycle restarts at 375
    np.testing.assert_allclose(L[375], 0.0, atol=1e-7)
    np.testing.assert_allclose(L[374], 1.0)  # flat top before restart


def test_normalize_roundtrip():
    x = np.random.default_rng(0).normal(3.0, 2.0, (5, 7)).astype(np.float32)
    xn, lo, hi = normalize_to_unit_segment(x)
    assert xn.min() == 0.0 and xn.max() == 1.0
    np.testing.assert_allclose(denormalize_unit_segment(xn, lo, hi), x,
                               rtol=1e-5)


def test_rand_time_and_time_loader():
    rng = np.random.default_rng(0)
    starts = [rand_time(rng, 100, 50) for _ in range(500)]
    assert min(starts) == 0 and max(starts) == 49  # Julia rand(1:50) 0-based
    x = np.arange(2 * 100 * 3, dtype=np.float32).reshape(2, 100, 3)
    w = time_loader(x, 100, 50, rng)
    assert w.shape == (2, 50, 3)
    # one SHARED window: both samples cut at the same offset
    s = int(w[0, 0, 0] // 3)
    np.testing.assert_array_equal(w[1], x[1, s:s + 50])


def test_sample_window_jit():
    x = jnp.arange(2 * 20 * 3, dtype=jnp.float32).reshape(2, 20, 3)
    w = jax.jit(lambda k: sample_window(k, x, 8))(jax.random.PRNGKey(0))
    assert w.shape == (2, 8, 3)


def test_dataloader_drop_partial_shuffle():
    data = np.arange(10)[:, None].astype(np.float32)
    dl = DataLoader(data, batch_size=4, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2 and all(b.shape == (4, 1) for b in batches)
    seen = sorted(int(v) for b in batches for v in b.ravel())
    assert len(set(seen)) == 8  # no duplicates within an epoch


def test_adam_matches_manual_first_step():
    p = {"w": jnp.array([1.0, -2.0])}
    g = {"w": jnp.array([0.5, 0.1])}
    opt = adam(lr=0.1)
    st = opt.init(p)
    up, st = opt.update(g, st, p)
    # first step: m=(1-b1)g, v=(1-b2)g^2; corrected m/c1=g, v/c2=g^2
    # update = lr * g / (|g| + eps) ~= lr * sign(g)
    np.testing.assert_allclose(np.asarray(up["w"]),
                               0.1 * np.sign([0.5, 0.1]), rtol=1e-4)
    p2 = apply_updates(p, up)
    np.testing.assert_allclose(np.asarray(p2["w"]), [0.9, -2.1], rtol=1e-4)


def test_adamw_flux_semantics():
    """update = adam(g) + decay * p, decay NOT scaled by lr (Flux ADAMW)."""
    p = {"w": jnp.array([10.0])}
    g = {"w": jnp.array([1.0])}
    base = adam(lr=0.01)
    aw = adamw(lr=0.01, decay=0.1)
    ub, _ = base.update(g, base.init(p), p)
    uw, _ = aw.update(g, aw.init(p), p)
    np.testing.assert_allclose(np.asarray(uw["w"] - ub["w"]), [1.0],
                               rtol=1e-6)  # 0.1 * 10.0


def test_adabelief_runs_and_descends():
    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2)

    p = {"w": jnp.array([0.0])}
    opt = adabelief(lr=0.1)
    st = opt.init(p)
    for _ in range(200):
        g = jax.grad(loss)(p)
        up, st = opt.update(g, st, p)
        p = apply_updates(p, up)
    assert abs(float(p["w"][0]) - 3.0) < 0.1


def test_clip_and_chain():
    p = {"w": jnp.array([1.0])}
    g = {"w": jnp.array([100.0])}
    opt = chain(clip_by_global_norm(1.0), adam(lr=0.1))
    st = opt.init(p)
    up, st = opt.update(g, st, p)
    assert np.isfinite(float(up["w"][0]))


def test_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(0)
    from latentdiffeq import nn
    net = nn.mlp(key, (4, 8, 2))
    opt = adamw(1e-3, decay=1e-3)
    state = {"model": net, "opt": opt.init(net)}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, meta={"epoch": 7, "note": "hi"})
    restored, meta = load_checkpoint(path, state)
    assert meta["epoch"] == 7 and meta["note"] == "hi"
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # structure mismatch must raise
    with pytest.raises(ValueError):
        load_checkpoint(path, {"model": net})


def test_checkpoint_rename_names_divergent_path(tmp_path):
    """A renamed field must fail with a message naming the exact paths —
    not a generic leaf-count error (format v2 is path-keyed)."""
    state = {"model": {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))},
             "epoch": jnp.asarray(3)}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    renamed = {"model": {"weight": jnp.ones((3, 2)), "b": jnp.zeros((2,))},
               "epoch": jnp.asarray(3)}
    with pytest.raises(ValueError) as ei:
        load_checkpoint(path, renamed)
    msg = str(ei.value)
    assert "model/weight" in msg and "model/w" in msg

    # same-shape key SWAP (undetectable by order+shape checks in v1) loads
    # correctly by path in v2
    swapped = {"model": {"b": jnp.zeros((2,)), "w": jnp.ones((3, 2))},
               "epoch": jnp.asarray(3)}
    tree, _ = load_checkpoint(path, swapped)
    np.testing.assert_array_equal(np.asarray(tree["model"]["w"]),
                                  np.ones((3, 2)))
    np.testing.assert_array_equal(np.asarray(tree["model"]["b"]),
                                  np.zeros((2,)))


def test_checkpoint_bf16_roundtrip(tmp_path):
    """bf16 leaves (numpy can't savez ml_dtypes types) round-trip exactly
    through the f32 on-disk representation."""
    state = {"w": jnp.arange(8, dtype=jnp.bfloat16) / 3,
             "b": jnp.ones((3,), jnp.float32)}
    path = str(tmp_path / "bf16.npz")
    save_checkpoint(path, state)
    tree, _ = load_checkpoint(path, state)
    assert tree["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(tree["w"].astype(jnp.float32)),
        np.asarray(state["w"].astype(jnp.float32)))


def test_checkpoint_legacy_v1_shim(tmp_path):
    """Order-keyed (v1) files written before the format change still load."""
    import json as _json
    state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        _json.dumps({"epoch": 5}).encode(), dtype=np.uint8)
    path = str(tmp_path / "old.npz")
    np.savez(path, **arrays)
    tree, meta = load_checkpoint(path, state)
    assert meta["epoch"] == 5
    for a, b in zip(leaves, jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_overfits_tiny_batch():
    """Overfit-one-batch integration test (SURVEY.md §4): GOKU on 8
    synthetic samples must drive the loss down hard."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer

    from create_data import generate_dataset
    _, _, _, frames = generate_dataset(n_traj=8, seed=0, tspan=(0.0, 1.45))
    x = frames.reshape(8, frames.shape[1], -1)  # (8, 30, 784) real video

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq, hidden_dim_resnet=64,
                              latent_to_diffeq_dim=64)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    cfg = TrainConfig(batch_size=8, seq_len=20, epochs=80, seed=0,
                      variational=False, val_every_batch=False,
                      save_best=False, n_cycle=1, start_beta=0.0,
                      end_beta=0.0)
    tr = Trainer(model, cfg)
    hist = tr.fit(x, x[:2], verbose=False)
    assert hist[-1]["train_loss"] < 0.5 * hist[0]["train_loss"]


@pytest.mark.slow
def test_cpu_mini_convergence_canary():
    """Mini-convergence canary (the code-drift guard for the quality-gate
    records, which only re-evaluate COMMITTED weights): train a small GOKU
    on 16 real pendulum-video trajectories through the full variational
    path — annealed ELBO, reparameterized sampling, on-chip solve — for
    400 epochs and pin an ABSOLUTE validation-loss bar. A regression in the
    KL term, the annealing schedule, the solver, or the optimizer keeps the
    loss far above it.

    Measured healthy behavior (CPU, this config): first loss ~188, best
    val ~40 — the bar at 80 carries 2x margin. Runtime ~30 s.
    """
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer
    from create_data import generate_dataset

    _, _, _, frames = generate_dataset(n_traj=20, seed=0, tspan=(0.0, 2.45))
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)  # (20, 50, 784)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq, hidden_dim_resnet=64,
                              latent_to_diffeq_dim=64)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    cfg = TrainConfig(batch_size=16, seq_len=30, epochs=400, seed=0,
                      start_beta=0.0, end_beta=1.0, n_cycle=1, ratio=0.5,
                      save_best=False, epochs_per_dispatch=50)
    tr = Trainer(model, cfg)
    hist = tr.fit(x[:16], x[16:], verbose=False)

    assert hist[0]["train_loss"] > 100, "sanity: starts untrained"
    assert tr.best_val_loss < 80.0, (
        f"mini-convergence canary failed: best val "
        f"{tr.best_val_loss:.1f} >= 80 (healthy ~40) — a learning "
        f"regression (KL/annealing/solver/optimizer) is likely")
    assert hist[-1]["train_loss"] < 70.0, (
        f"train loss stalled at {hist[-1]['train_loss']:.1f} (healthy ~33)")


@pytest.mark.slow
def test_trainer_sde_goku_descends():
    """Stochastic-pendulum GOKU (SRA1 over the virtual Brownian tree, the
    SOSRI-role default) trains through the Trainer and the loss descends —
    the SDE path exercised end-to-end (pathwise gradients through the
    bridge increments)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import SPendulum
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer
    from create_data import generate_dataset

    _, _, _, frames = generate_dataset(n_traj=8, seed=0, tspan=(0.0, 1.45))
    x = frames.reshape(8, frames.shape[1], -1)
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], SPendulum(),
                              hidden_dim_resnet=64, latent_to_diffeq_dim=64)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    cfg = TrainConfig(batch_size=8, seq_len=20, epochs=60, seed=0,
                      variational=True, val_every_batch=False,
                      save_best=False, n_cycle=1, start_beta=0.0,
                      end_beta=0.0)
    tr = Trainer(model, cfg)
    hist = tr.fit(x, x[:2], verbose=False)
    assert hist[-1]["train_loss"] < 0.6 * hist[0]["train_loss"]


@pytest.mark.slow
def test_trainer_resume_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer

    x = np.random.default_rng(1).random((4, 20, 16), dtype=np.float32)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 16,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    cfg = TrainConfig(batch_size=4, seq_len=10, epochs=4, seed=0,
                      val_every_batch=False, save_best=False)
    tr = Trainer(model, cfg)
    tr.fit(x, x[:1], epochs=2, verbose=False)
    path = str(tmp_path / "state.npz")
    tr.save(path)

    tr2 = Trainer(model, cfg).restore(path)
    assert tr2.epoch == 2
    h1 = tr.fit(x, x[:1], epochs=4, verbose=False)
    h2 = tr2.fit(x, x[:1], epochs=4, verbose=False)
    np.testing.assert_allclose(h1[-1]["train_loss"], h2[-1]["train_loss"],
                               rtol=1e-5)


@pytest.mark.slow
def test_trainer_block_mode_matches_semantics(tmp_path):
    """Block-dispatch training must track best-val weights on-device and
    reach comparable loss to the per-epoch path."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from create_data import generate_dataset
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer

    _, _, _, frames = generate_dataset(n_traj=8, seed=0, tspan=(0.0, 0.95))
    x = frames.reshape(8, 20, -1)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq, hidden_dim_resnet=32,
                              latent_to_diffeq_dim=32)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    def run(epd):
        cfg = TrainConfig(batch_size=4, seq_len=10, epochs=20, seed=0,
                          epochs_per_dispatch=epd, save_best=True,
                          checkpoint_dir=str(tmp_path / f"ckpt{epd}"))
        tr = Trainer(model, cfg)
        hist = tr.fit(x[:4], x[4:], verbose=False)
        return tr, hist

    tr_b, hist_b = run(10)
    tr_e, hist_e = run(1)
    assert len(hist_b) == len(hist_e) == 20
    # both modes make progress and land in the same ballpark
    assert hist_b[-1]["train_loss"] < hist_b[0]["train_loss"]
    assert abs(hist_b[-1]["train_loss"] - hist_e[-1]["train_loss"]) \
        < 0.35 * hist_e[-1]["train_loss"]
    # best checkpoint written by block mode, loadable
    tr2 = Trainer(model, tr_b.cfg).restore(
        str(tmp_path / "ckpt10" / "best_model.npz"))
    assert tr2.best_val_loss <= hist_b[-1]["val_loss"] + 1e-3


@pytest.mark.slow
def test_progressive_training_curriculum():
    """Progressive seq_len (model_train.jl:142-147,178): lengths ramp from
    start to full; rounding knob caps distinct compile lengths."""
    from latentdiffeq.train.trainer import _prog_seq_lengths
    cfg = TrainConfig(seq_len=50, progressive_training=True,
                      prog_training_duration=40, start_seq_len=10,
                      prog_seq_len_step=None)
    L = _prog_seq_lengths(cfg)
    assert L[0] == 10 and L[-1] == 50 and np.all(np.diff(L) >= 0)
    cfg5 = TrainConfig(seq_len=50, progressive_training=True,
                      prog_training_duration=40, start_seq_len=10,
                      prog_seq_len_step=5)
    L5 = _prog_seq_lengths(cfg5)
    assert set(L5) <= {10, 15, 20, 25, 30, 35, 40, 45, 50}
    assert L5[-1] == 50

    # end-to-end: a short progressive run trains through the length switch
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 16,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    x = np.random.default_rng(0).random((4, 30, 16), dtype=np.float32)
    cfg = TrainConfig(batch_size=4, seq_len=20, epochs=6, seed=0,
                      progressive_training=True, prog_training_duration=4,
                      start_seq_len=10, prog_seq_len_step=5,
                      epochs_per_dispatch=4, save_best=False)
    tr = Trainer(model, cfg)
    hist = tr.fit(x, x[:2], verbose=False)
    assert len(hist) == 6
    assert hist[0]["seq_len"] == 10 and hist[-1]["seq_len"] == 20


def test_full_length_window_edge():
    """seq_len == full sequence length must work (window start pinned 0)."""
    rng = np.random.default_rng(0)
    assert rand_time(rng, 50, 50) == 0
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    w = jax.jit(lambda k: sample_window(k, x, 10))(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(w), np.asarray(x))


def test_fit_validates_seq_len_and_batch_size():
    """Friendly errors instead of cryptic jit failures: seq_len longer than
    the data's T, and batch_size larger than the training set (zero
    minibatches — the reference's DataLoader drops partial batches,
    model_train.jl:120)."""
    import numpy as np
    import pytest
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import Trainer

    x = np.random.default_rng(0).random((6, 12, 64)).astype(np.float32)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 64,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(batch_size=4, seq_len=50, epochs=1, save_best=False)
    with pytest.raises(ValueError, match="seq_len"):
        Trainer(model, cfg).fit(x, x[:2], verbose=False)

    cfg = TrainConfig(batch_size=64, seq_len=8, epochs=1, save_best=False)
    with pytest.raises(ValueError, match="batch_size"):
        Trainer(model, cfg).fit(x, x[:2], verbose=False)


@pytest.mark.slow
def test_original_data_script_end_to_end(tmp_path):
    """The third reference training script (train_original_data.py, the
    model_train_original_data.jl role) runs end to end on a synthetic
    stand-in npz shaped like the GOKU-paper dataset (the real file needs
    network egress). Exercises the script's full path: npz load, min-max
    normalization, fixed tiny beta, plain ADAM, checkpoint write."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(0)
    data = (40.0 * rng.random((18, 16, 64))).astype(np.float32)
    npz = tmp_path / "processed_data.npz"
    np.savez(npz, train_data=data)

    script = os.path.join(os.path.dirname(__file__), "..", "examples",
                          "pendulum", "train_original_data.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, LDQ_PLATFORM="cpu",
               # the subprocess runs from tmp_path: make the library
               # importable even without the editable install
               PYTHONPATH=os.pathsep.join(
                   p for p in (repo_root, os.environ.get("PYTHONPATH"))
                   if p))
    out = subprocess.run(
        [_sys.executable, script, "--data", str(npz), "--epochs", "2",
         "--batch-size", "16", "--seq-len", "12"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    ckpt = os.path.join(os.path.dirname(script), "output_original",
                        "best_model.npz")
    assert os.path.exists(ckpt)


@pytest.mark.slow
def test_autosize_adaptive_budget_shrinks_and_preserves_training():
    """TrainConfig.autosize_adaptive (the COST-NOTE knob automated): the
    probe must SHRINK the masked-scan budget on an easy workload, and the
    autosized run must produce the same training math — masked scan
    iterations beyond the last accepted step are no-ops, so shrinking the
    budget below the default changes cost, not values."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import Pendulum, SPendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.solve.sde import SDEAdaptiveConfig
    from latentdiffeq.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(24, 12, 48)).astype("float32")

    def build(diffeq):
        enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 48,
                                  diffeq, hidden_dim_resnet=32,
                                  latent_to_diffeq_dim=32)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    # --- SDE path (the adaptive flagship workload) ---
    sde = SPendulum(adaptive=True, adaptive_cfg=SDEAdaptiveConfig(
        rtol=1e-2, atol=1e-2, max_steps=256, depth_cap=6))
    cfg = TrainConfig(batch_size=8, seq_len=12, epochs=4, seed=0,
                      save_best=False, epochs_per_dispatch=2,
                      autosize_adaptive=True)
    tr_a = Trainer(build(sde), cfg)
    sized = tr_a.autosize_adaptive_budget(x[:16])
    assert sized is not None and sized < 256, sized
    de = tr_a.model.decoder.diffeq
    assert de.adaptive_cfg.max_steps == sized

    hist_a = tr_a.fit(x[:16], x[16:], verbose=False)
    tr_b = Trainer(build(sde), dataclasses.replace(
        cfg, autosize_adaptive=False))
    hist_b = tr_b.fit(x[:16], x[16:], verbose=False)
    for ra, rb in zip(hist_a, hist_b):
        np.testing.assert_allclose(ra["train_loss"], rb["train_loss"],
                                   rtol=1e-6)
        np.testing.assert_allclose(ra["val_loss"], rb["val_loss"],
                                   rtol=1e-6)

    # --- adaptive-ODE path ---
    ode = Pendulum(options=make_options(adaptive=True))
    tr_o = Trainer(build(ode), cfg)
    sized_o = tr_o.autosize_adaptive_budget(x[:16])
    assert sized_o is not None
    assert sized_o < 256
    assert tr_o.model.decoder.diffeq.options.adaptive_cfg.max_steps \
        == sized_o

    # --- fixed-grid: no-op ---
    tr_f = Trainer(build(Pendulum(options=make_options(adaptive=False,
                                                       substeps=1))), cfg)
    assert tr_f.autosize_adaptive_budget(x[:16]) is None


def test_autosize_quantile_budget():
    """autosize_quantile < 1 (the adaptive-SDE cost lever): the quantile
    budget never exceeds the worst-case budget, requires
    mask_failures=True (an expected-to-fail tail with an unmasked loss
    would poison whole batches), and training proceeds with finite
    losses under the mask."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import SPendulum
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.solve.sde import SDEAdaptiveConfig
    from latentdiffeq.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(24, 12, 48)).astype("float32")
    sde = SPendulum(adaptive=True, adaptive_cfg=SDEAdaptiveConfig(
        rtol=1e-2, atol=1e-2, max_steps=256, depth_cap=6))

    def build():
        enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 48,
                                  sde, hidden_dim_resnet=32,
                                  latent_to_diffeq_dim=32)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    base = TrainConfig(batch_size=8, seq_len=12, epochs=2, seed=0,
                       save_best=False, epochs_per_dispatch=2,
                       autosize_adaptive=True)

    # quantile without mask_failures: refused loudly
    tr = Trainer(build(), dataclasses.replace(base, autosize_quantile=0.5))
    with pytest.raises(ValueError, match="mask_failures"):
        tr.autosize_adaptive_budget(x[:16])

    # quantile budget <= worst-case budget (floor=1 so tiny easy probes
    # can't hide the ordering under the default floor of 16)
    tr_max = Trainer(build(), dataclasses.replace(
        base, mask_failures=True, autosize_quantile=1.0))
    sized_max = tr_max.autosize_adaptive_budget(x[:16], floor=1)
    tr_q = Trainer(build(), dataclasses.replace(
        base, mask_failures=True, autosize_quantile=0.5))
    sized_q = tr_q.autosize_adaptive_budget(x[:16], floor=1)
    assert sized_q is not None and sized_max is not None
    assert sized_q <= sized_max

    hist = tr_q.fit(x[:16], x[16:], verbose=False)
    assert all(np.isfinite(r["train_loss"]) for r in hist)
    assert all(np.isfinite(r["val_loss"]) for r in hist)


@pytest.mark.slow
def test_autosize_adaptive_budget_population():
    """MultiSeedTrainer twin: the shared static budget shrinks across the
    stacked population and training proceeds."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from pendulum import SPendulum
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.solve.sde import SDEAdaptiveConfig
    from latentdiffeq.train import MultiSeedTrainer

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(24, 12, 48)).astype("float32")
    sde = SPendulum(adaptive=True, adaptive_cfg=SDEAdaptiveConfig(
        rtol=1e-2, atol=1e-2, max_steps=256, depth_cap=6))

    def init_fn(k):
        enc, dec = default_layers(k, GOKUBasic(), 48, sde,
                                  hidden_dim_resnet=32,
                                  latent_to_diffeq_dim=32)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(batch_size=8, seq_len=12, epochs=2, seed=0,
                      save_best=False, epochs_per_dispatch=2,
                      autosize_adaptive=True)
    ms = MultiSeedTrainer(init_fn, cfg, [0, 1])
    sized = ms.autosize_adaptive_budget(x[:16])
    assert sized is not None and sized < 256
    assert ms.models.decoder.diffeq.adaptive_cfg.max_steps == sized
    ms.fit(x[:16], x[16:], verbose=False)
    assert np.isfinite(np.asarray(ms.per_seed_best_vals)).all()


def test_latent_warm_start_regresses_and_isolates():
    """latent_warm_start (the assignment-aware-init machinery): the
    deterministic encode -> latent_out path regresses onto caller
    targets, the loss trace converges, and slots the loss never touches
    (diffeq, reconstructor) stay bit-identical — warm start must not
    perturb the decoder it is aligning the encoder TO."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "custom_dynamics"))
    from custom import VanDerPol
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import latent_warm_start

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(16, 10, 8)).astype("float32")
    z0_t = jnp.asarray(rng.normal(size=(16, 2)).astype("float32"))
    th_t = jnp.asarray(rng.uniform(0.5, 2.0, (16, 1)).astype("float32"))

    diffeq = VanDerPol(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(5), GOKUBasic(), 8,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    def loss_fn(l_hat):
        z0_hat, th_hat = l_hat
        return (jnp.mean((z0_hat - z0_t) ** 2)
                + jnp.mean((th_hat - th_t) ** 2))

    warm, losses = latent_warm_start(model, jnp.asarray(x), loss_fn,
                                     steps=300, lr=3e-3)
    assert float(losses[-1]) < 0.2 * float(losses[0])

    # untouched slots are bit-identical
    for a, b in zip(jax.tree.leaves(model.decoder.reconstructor),
                    jax.tree.leaves(warm.decoder.reconstructor)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(model.decoder.diffeq),
                    jax.tree.leaves(warm.decoder.diffeq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the regressed path actually moved toward the targets
    mu, _ = warm.encoder(jnp.asarray(x))
    z0_hat, th_hat = warm.model_type.apply_latent_out(warm.decoder, mu)
    assert float(jnp.mean((z0_hat - z0_t) ** 2)) < 0.5

    # jit-compatible (the MultiSeedTrainer vmapped-factory contract)
    jitted, jlosses = jax.jit(
        lambda m: latent_warm_start(m, jnp.asarray(x), loss_fn, steps=5)
    )(model)
    assert np.isfinite(np.asarray(jlosses)).all()


def test_loss_batch_anchor_term():
    """Latent chart anchor (loss_batch anchor=): weight 0 / anchor None
    reproduce the reference loss bitwise; a nonzero weight adds exactly
    vector_mse(anchor(x), z_hat) with the reconstruction term's
    reductions; masking paths stay consistent."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "custom_dynamics"))
    from custom import VanDerPol
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import loss_batch, vector_mse

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(size=(4, 6, 8)).astype("float32"))
    t = jnp.arange(6, dtype=jnp.float32) * 0.1
    diffeq = VanDerPol(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(2), GOKUBasic(), 8,
                              diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    R = jnp.asarray(rng.normal(size=(2, 8)).astype("float32"))
    anchor = lambda xb: xb @ R.T  # noqa: E731

    base, bm = loss_batch(model, x, t, 0.5, variational=False)
    off, _ = loss_batch(model, x, t, 0.5, variational=False,
                        anchor=anchor, anchor_weight=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))

    w = 0.7
    anc, am = loss_batch(model, x, t, 0.5, variational=False,
                         anchor=anchor, anchor_weight=w)
    (_, z_hat, _), _, _, _ = model(x, t, variational=False)
    expected = float(base) + w * float(vector_mse(anchor(x), z_hat))
    np.testing.assert_allclose(float(anc), expected, rtol=1e-6)
    np.testing.assert_allclose(float(am["anchor"]),
                               float(vector_mse(anchor(x), z_hat)),
                               rtol=1e-6)

    # cur_len masking: anchored loss at cur_len == full T equals unmasked
    full, _ = loss_batch(model, x, t, 0.5, variational=False,
                         anchor=anchor, anchor_weight=w,
                         cur_len=jnp.int32(6))
    np.testing.assert_allclose(float(full), float(anc), rtol=1e-6)

    # anchor_frames: only the first k frames contribute, normalized over
    # k — equals vector_mse on the sliced prefix; k >= T equals unsliced
    k = 2
    fr, fm = loss_batch(model, x, t, 0.5, variational=False,
                        anchor=anchor, anchor_weight=w, anchor_frames=k)
    exp_anc = float(vector_mse(anchor(x)[:, :k], z_hat[:, :k]))
    np.testing.assert_allclose(float(fm["anchor"]), exp_anc, rtol=1e-6)
    np.testing.assert_allclose(float(fr), float(base) + w * exp_anc,
                               rtol=1e-6)
    big, _ = loss_batch(model, x, t, 0.5, variational=False,
                        anchor=anchor, anchor_weight=w, anchor_frames=99)
    np.testing.assert_allclose(float(big), float(anc), rtol=1e-6)
