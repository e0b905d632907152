"""Decompose the af1 (z0-frame anchor) failure: did ELBO training
abandon the anchor (pay anchor loss to mix the basin), or satisfy it at
frame 0 while never identifying omega (chart aligned at t=0, scrambled
by wrong dynamics)?

Measures, for the af1 winner's best checkpoint AND a fresh warm-started
init (the same init the campaign trained from):

- anchor_mse: per-oscillator MSE of sin(z0_hat) vs the lift readout at
  frame 0, on the train set (the term the optimizer paid anchor_weight
  for on every window).
- state_corr over frames [0:10] vs [0:100] (optimal-assignment matched,
  val set): early-window chart vs full-horizon chart.

Run on CPU while the TPU is busy:
    LDQ_PLATFORM=cpu python benchmarks/diag_kuramoto_af1.py
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from quality_kuramoto import (DT, _match_corr, build_model_keyed,  # noqa: E402
                              warm_start)
from train_kuramoto import (estimate_omega_k, fit_lift_readout,  # noqa: E402
                            invert_lift_phases, make_data)

from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                splitobs)

POP = os.path.join(ROOT, "benchmarks", "output_quality",
                   "kuramoto_spread05_b1e5_kl_ws_af1_pop4",
                   "population.npz")


def probe(model, train_set, val_set, val_zsin, readout):
    t = jnp.arange(100, dtype=jnp.float32) * DT

    @jax.jit
    def fwd(m, xv):
        mu, _ = m.encoder(xv)
        (x_hat, z_hat, l_hat), aux = m.decoder(mu, t,
                                               key=jax.random.PRNGKey(0))
        return z_hat

    zt = np.asarray(fwd(model, jnp.asarray(train_set)))
    anchor_mse = float(np.mean((readout(train_set)[:, 0] - zt[:, 0]) ** 2))

    zv = np.asarray(fwd(model, jnp.asarray(val_set)))
    true = np.asarray(val_zsin)[:, :100]
    early = [_match_corr(zv[i, :10], true[i, :10])[0]
             for i in range(zv.shape[0])]
    full = [_match_corr(zv[i], true[i])[0] for i in range(zv.shape[0])]
    return {"anchor_mse_frame0_train": round(anchor_mse, 5),
            "state_corr_median_frames0_10": round(
                float(np.median(early)), 4),
            "state_corr_median_full": round(float(np.median(full)), 4)}


def main():
    x, z_sin, thetas, kur, lift = make_data(
        n_osc=10, k_range=(0.2, 2.0), omega_spread=0.5, return_lift=True)
    train_set, val_set = splitobs(x, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)

    R, c = fit_lift_readout(lift)

    def readout(xb):
        return np.asarray(xb) @ R.T + c

    cfg = TrainConfig(lr=1e-3, decay=1e-3, batch_size=64, seq_len=100,
                      epochs=2000, seed=1, dt=DT, start_beta=0.0,
                      end_beta=1e-5, n_cycle=1, ratio=0.9,
                      epochs_per_dispatch=25)
    seeds = [1, 2, 3, 4]
    ms = MultiSeedTrainer(
        lambda k: build_model_keyed(x.shape[-1], k, kur, lift), cfg, seeds)
    ms.restore(POP)
    winner_idx = int(np.nanargmin(np.asarray(ms.per_seed_best_vals)))
    trained = ms.best_seed_model(winner_idx)

    phi, _ = invert_lift_phases(train_set, lift, DT)
    deltas = np.linspace(-0.5, 0.5, 10)
    om_ls, k_ls = estimate_omega_k(phi, deltas, DT)
    warm = warm_start(
        build_model_keyed(x.shape[-1],
                          jax.random.PRNGKey(seeds[winner_idx]), kur, lift),
        train_set, (phi, om_ls, k_ls), steps=1500)

    rec = {"tag": "diag_kuramoto_af1",
           "winner_seed": seeds[winner_idx],
           "warm_init": probe(warm, train_set, val_set, val_zsin, readout),
           "af1_trained": probe(trained, train_set, val_set, val_zsin,
                                readout)}
    out = os.path.join(ROOT, "benchmarks", "diag_kuramoto_af1.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
