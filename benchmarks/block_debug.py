"""Controlled block-vs-epoch divergence experiment.

One epoch of _make_block_fn is bitwise identical to _make_epoch_fn given
the same epoch key (verified on CPU; threefry split-prefix consistency even
makes the kwin/kvar tapes match). This script feeds BOTH paths the exact
same per-epoch keys / permutations / betas on the flagship workload and
compares their val-loss trajectories — isolating compiled-program numerics
from RNG-tape differences as the cause of the block-mode collapse.

Run on TPU: python benchmarks/block_debug.py [epochs]
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    E = 25

    from create_data import load_or_generate
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import TrainConfig, Trainer, splitobs
    from latentdiffeq.train.annealing import frange_cycle_linear

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(1), GOKUBasic(),
                              x.shape[-1], diffeq)
    model0 = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(batch_size=64, seq_len=100, epochs=3000, seed=1,
                      save_best=False)
    schedule = frange_cycle_linear(3000, 0.0, 1.0, 4, 0.9)

    data = jnp.asarray(train_set)
    val = jnp.asarray(val_set)
    n = data.shape[0]
    steps = n // cfg.batch_size

    # shared tape: per-epoch keys, permutations, betas
    rng = np.random.default_rng(7)
    keys = jax.random.split(jax.random.PRNGKey(7), n_epochs)
    idx = np.stack([rng.permutation(n)[:steps * cfg.batch_size]
                    .reshape(steps, cfg.batch_size)
                    for _ in range(n_epochs)])
    betas = np.asarray(schedule[:n_epochs], np.float32)

    tr = Trainer(model0, cfg)
    epoch_fn = tr._make_epoch_fn(cfg.seq_len, steps, val.shape[1])
    block_fn = tr._make_block_fn(cfg.seq_len, steps, val.shape[1], E)

    # Path A: per-epoch dispatch
    mA, oA = tr.model, tr.opt_state
    valA = []
    for e in range(n_epochs):
        mA, oA, ms, vm = epoch_fn(mA, oA, data, val, jnp.asarray(idx[e]),
                                  keys[e], jnp.float32(betas[e]))
        valA.append(float(vm["loss"]))

    # Path B: 25-epoch fused blocks, SAME keys/permutations/betas
    mB, oB = tr.model, tr.opt_state
    best = {"model": tr.model, "opt_state": tr.opt_state,
            "val": jnp.float32(np.inf), "epoch": jnp.int32(0)}
    valB = []
    for b in range(n_epochs // E):
        sl = slice(b * E, (b + 1) * E)
        (mB, oB, best), summ = block_fn(
            mB, oB, best, data, val, jnp.asarray(idx[sl]), keys[sl],
            jnp.asarray(betas[sl]),
            jnp.arange(b * E, (b + 1) * E, dtype=jnp.int32))
        valB.extend(np.asarray(summ["val_loss"]).tolist())

    print("epoch  valA(per-epoch)  valB(block25)")
    for e in range(0, n_epochs, 50):
        print(f"{e:5d}  {valA[e]:10.4f}  {valB[e]:10.4f}")
    print(f"final  {valA[-1]:10.4f}  {valB[-1]:10.4f}")
    dmax50 = max(abs(a - b) for a, b in zip(valA[:50], valB[:50]))
    print(f"max |A-B| over first 50 epochs: {dmax50:.6f}")


if __name__ == "__main__":
    main()
