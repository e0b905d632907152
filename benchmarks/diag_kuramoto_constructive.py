"""Explain the Kuramoto z0-regression generalization gap (VERDICT r4
item 2a): the round-4 warm regression fit its TRAIN objective to MSE
0.037 yet val identity-assignment corr stayed ~0. Two hypotheses:

(a) capacity/memorization — the z0 regression supervises only the
    window-start frame through the whole RNN path (~1 target row per
    trajectory), a tiny effective dataset a 64->100->32 resnet + RNN can
    memorize without learning the frame-wise readout;
(b) the readout itself does not generalize — refuted in advance by the
    ridge probe (R^2 0.99 frame-wise on val).

Measurement: warm-start the SAME regression on (1) the default random-
init encoder and (2) the constructive encoder (ridge-readout FrozenLinear
FE, identity-aligned slots) and compare TRAIN-vs-VAL z0-target MSE and
val identity corr at epoch 0 (no ELBO training). If (a) holds, the
random-FE run shows a large train/val gap while the constructive run
closes it — the aligned frame-wise features are the thing the z0
regression cannot learn from window-start supervision alone.

Run on the TPU: python benchmarks/diag_kuramoto_constructive.py
"""
from __future__ import annotations

import json
import os
import sys

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import quality_kuramoto as qk  # noqa: E402
from train_kuramoto import (estimate_omega_k, invert_lift_phases,  # noqa: E402
                            make_data)
from latentdiffeq.train import splitobs  # noqa: E402

DT = 0.1


def z0_target_mse(model, x, phi):
    """MSE of the deterministic z0 path against the inversion targets in
    (sin, cos) space — the warm objective's z0 term, on any split."""
    xb = jnp.asarray(x)
    sin0 = np.sin(phi[:, 0])
    cos0 = np.cos(phi[:, 0])

    @jax.jit
    def fwd(m):
        mu, _ = m.encoder(xb)
        z0_hat, _ = m.model_type.apply_latent_out(m.decoder, mu)
        return z0_hat

    z0 = np.asarray(fwd(model))
    return float(np.mean((np.sin(z0) - sin0) ** 2)
                 + np.mean((np.cos(z0) - cos0) ** 2))


def main():
    x, z_sin, thetas, kur, lift = make_data(omega_spread=0.5,
                                            return_lift=True)
    train_set, val_set = splitobs(x, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)
    _, val_thetas = splitobs(thetas, 0.9)

    print("inverting lift for targets (train and val)...", flush=True)
    phi_tr, _ = invert_lift_phases(train_set, lift, DT)
    phi_va, _ = invert_lift_phases(val_set, lift, DT)
    deltas = np.linspace(-0.5, 0.5, 10)
    om, kk = estimate_omega_k(phi_tr, deltas, DT)
    estimates = (phi_tr, om, kk)

    out = {}
    for name, constructive, steps in (("random_fe", False, 8000),
                                      ("constructive_fe", True, 4000)):
        m = qk.build_model_keyed(x.shape[-1], jax.random.PRNGKey(1), kur,
                                 lift, constructive)
        m = qk.warm_start(m, train_set, estimates, steps=steps)
        row = {
            "warm_steps": steps,
            "z0_mse_train": round(z0_target_mse(m, train_set, phi_tr), 4),
            "z0_mse_val": round(z0_target_mse(m, val_set, phi_va), 4),
        }
        e = qk.evaluate(m, val_set, val_zsin, val_thetas)
        row.update({
            "val_identity_corr_median": round(
                e["state_corr_identity_median"], 4),
            "val_state_corr_median": round(e["state_corr_median"], 4),
            "omega_corr": round(e["omega_corr"], 4),
            "k_corr": round(e["k_corr"], 4),
        })
        out[name] = row
        print(name, json.dumps(row), flush=True)

    with open(os.path.join(ROOT, "benchmarks",
                           "diag_kuramoto_constructive.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
