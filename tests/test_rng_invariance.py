"""Training-RNG invariance to dispatch blocking and fit slicing.

Round 2 measured real quality divergence between ``epochs_per_dispatch``
settings (RESULTS.md "block-dispatch investigation"): per-epoch training
keys were drawn from a sequential split chain, so the grouping of epochs
into dispatches shifted every downstream random draw. Round 3 derives
epoch i's key as ``fold_in(fold_in(PRNGKey(seed), tag), i)`` — a pure
function of (seed, epoch) (trainer._epoch_keys) — which makes blocking
and fit-slicing pure performance knobs. These tests pin that contract.
"""
import os
import pytest
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))

from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                Trainer)
from pendulum import Pendulum  # noqa: E402


def _data():
    return np.random.default_rng(1).random((8, 20, 16), dtype=np.float32)


def _model(key=None):
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    key = key if key is not None else jax.random.PRNGKey(0)
    enc, dec = default_layers(key, GOKUBasic(),
                              16, diffeq, hidden_dim_resnet=16,
                              latent_to_diffeq_dim=16)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def _cfg(**kw):
    base = dict(batch_size=4, seq_len=10, epochs=6, seed=0,
                save_best=False, n_cycle=1, start_beta=0.0, end_beta=1.0)
    base.update(kw)
    return TrainConfig(**base)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow
def test_dispatch_blocking_bitwise_invariant():
    """epochs_per_dispatch 1 (per-epoch jit path), 2, and 6 (block paths
    with different boundaries) produce identical training: same per-epoch
    losses, same final weights."""
    x = _data()
    model = _model()
    runs = {}
    for epd in (1, 2, 6):
        tr = Trainer(model, _cfg(epochs_per_dispatch=epd))
        hist = tr.fit(x[:4], x[4:], verbose=False)
        runs[epd] = (_leaves(tr.model),
                     [h["train_loss"] for h in hist],
                     [h["val_loss"] for h in hist])
    for epd in (2, 6):
        for a, b in zip(runs[1][0], runs[epd][0]):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7,
                                       err_msg=f"epd={epd} weights diverge")
        np.testing.assert_allclose(runs[1][1], runs[epd][1], rtol=1e-5)
        np.testing.assert_allclose(runs[1][2], runs[epd][2], rtol=1e-5)


@pytest.mark.slow
def test_fit_slicing_invariant():
    """fit(epochs=3) then fit(epochs=6) equals one fit(epochs=6) — the
    contract the time-to-gate harness (eval-every-N slicing) relies on."""
    x = _data()
    model = _model()
    tr_a = Trainer(model, _cfg(epochs_per_dispatch=25))
    tr_a.fit(x[:4], x[4:], epochs=3, verbose=False)
    tr_a.fit(x[:4], x[4:], epochs=6, verbose=False)
    tr_b = Trainer(model, _cfg(epochs_per_dispatch=25))
    tr_b.fit(x[:4], x[4:], epochs=6, verbose=False)
    for a, b in zip(_leaves(tr_a.model), _leaves(tr_b.model)):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


@pytest.mark.slow
def test_multiseed_dispatch_blocking_invariant():
    """MultiSeedTrainer: per-seed tapes are a pure function of (seed,
    epoch) — blocking does not shift any replica's stream."""
    x = _data()
    finals = {}
    for epd in (2, 4):
        tr = MultiSeedTrainer(_model, _cfg(epochs=4, epochs_per_dispatch=epd),
                              seeds=[0, 7])
        tr.fit(x[:4], x[4:], verbose=False)
        finals[epd] = _leaves(tr.models)
    for a, b in zip(finals[2], finals[4]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
