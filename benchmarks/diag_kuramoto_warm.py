"""Diagnostic for the Kuramoto assignment-aware warm start: where does
the alignment degrade — the inversion estimates, the warm-start
regression, or the subsequent ELBO training?

Stages measured (spread-0.5 campaign config):
1. invert_lift_phases accuracy: omega_hat vs true omega, plus a
   dynamics-residual least-squares K_hat (regress dphi/dt - delta_i on
   the coupling term) vs true K.
2. warm-start-only model (no ELBO training): full evaluate() — if the
   chart is already absent here, the regression is the weak stage; if
   present, ELBO training is what destroys it.
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from train_kuramoto import (estimate_omega_k, invert_lift_phases,  # noqa: E402
                            make_data)

from latentdiffeq.train import splitobs  # noqa: E402

from quality_kuramoto import (DT, build_model_keyed, evaluate,  # noqa: E402
                              warm_start)

N_OSC, SPREAD, KMAX = 10, 0.5, 2.0


def main():
    x, z_sin, thetas, kur, lift = make_data(
        n_osc=N_OSC, k_range=(0.2, KMAX), omega_spread=SPREAD,
        return_lift=True)
    train_set, val_set = splitobs(x, 0.9)
    tr_thetas, val_thetas = splitobs(thetas, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)

    phi, om_hat = invert_lift_phases(train_set, lift, DT)
    deltas = np.linspace(-SPREAD, SPREAD, N_OSC)
    om_ls, k_ls = estimate_omega_k(phi, deltas)

    def acc(pred, true):
        return {"corr": round(float(np.corrcoef(pred, true)[0, 1]), 4),
                "err_med": round(float(np.median(np.abs(pred - true))), 4)}

    report = {
        "stage1_inversion": {
            "omega_median_rate": acc(om_hat, tr_thetas[:, 0]),
            "omega_residual_ls": acc(om_ls, tr_thetas[:, 0]),
            "k_residual_ls": acc(k_ls, tr_thetas[:, 1]),
        }
    }
    print(json.dumps(report["stage1_inversion"], indent=2), flush=True)

    key = jax.random.PRNGKey(2)
    model = build_model_keyed(x.shape[-1], key, kur, lift)
    report["stage0_random_init"] = evaluate(model, val_set, val_zsin,
                                            val_thetas)
    print("random init:", json.dumps(report["stage0_random_init"]),
          flush=True)

    warm = warm_start(model, train_set, (phi, om_ls, k_ls), steps=1500)
    report["stage2_warm_only"] = evaluate(warm, val_set, val_zsin,
                                          val_thetas)
    print("warm only:", json.dumps(report["stage2_warm_only"]), flush=True)

    with open(os.path.join(ROOT, "benchmarks",
                           "diag_kuramoto_warm.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
