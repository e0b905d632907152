"""Root-cause the composite winners' WORST validation trajectory
(VERDICT r4 item 4): the round-4 composite winner's worst beyond-context
angle corr is -0.41 — is that a data outlier (e.g. a trajectory near the
pendulum separatrix, where period sensitivity to L diverges) or a model
failure mode?

For each committed winner artifact this prints/commits, per val
trajectory: beyond-context angle corr, the trajectory's physical
placement (energy ratio E/E_sep — the separatrix is E/E_sep = 1,
oscillation amplitude, true L), and the pixel-readout L error (is the
OBSERVATION hard to invert there?). The record ranks the worst
trajectories and states whether the same trajectories are hard for both
winners (data-side) or winner-specific (model-side).

Usage: python benchmarks/diag_worst_traj.py [--cpu]
reference: the per-sample inspection role of model_train.jl:244-290.
"""
from __future__ import annotations

import json
import os
import sys

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quality_goku import _forecast_fwd, pearson_rows  # noqa: E402
from create_data import load_or_generate  # noqa: E402
from pendulum import Pendulum, G  # noqa: E402
from pixel_observable import pendulum_pixel_estimates  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import Trainer, TrainConfig, splitobs  # noqa: E402
from latentdiffeq.train.checkpoint import load_checkpoint  # noqa: E402

CTX = 50
DT = 0.05

WINNERS = {
    "r4_fc_px_both_winner": "benchmarks/artifacts/fc_px_both_winner.npz",
    "r5_fc_ws_px_both_winner": "benchmarks/artifacts/fc_ws_px_both_winner.npz",
}


def main():
    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)

    lat = np.asarray(val_latent)          # (n, T, 2) [theta, omega]
    L = np.asarray(val_ps).reshape(-1)
    th0, om0 = lat[:, 0, 0], lat[:, 0, 1]
    # pendulum energy per unit mass: E = L^2 om^2/2 - G L cos th
    # separatrix (swing-over threshold): E_sep = G L  =>  ratio
    # (E + G L) / (2 G L) in [0, 1) oscillates, >= 1 rotates
    E = 0.5 * (L * om0) ** 2 - G * L * np.cos(th0)
    sep_ratio = (E + G * L) / (2 * G * L)
    amp = np.abs(lat[:, :, 0]).max(axis=1)
    # is the OBSERVATION hard there? pixel-readout L error per trajectory
    _, _, L_px = pendulum_pixel_estimates(val_set, DT)
    px_L_err = np.abs(L_px - L)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def build():
        enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                                  x.shape[-1], diffeq)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    xv = jnp.asarray(val_set)
    T = xv.shape[1]
    t = jnp.arange(T, dtype=jnp.float32) * DT
    true_angle = lat[:, :T, 0]

    out = {"per_traj": {
        "sep_ratio": [round(float(v), 4) for v in sep_ratio],
        "amplitude": [round(float(v), 4) for v in amp],
        "L_true": [round(float(v), 4) for v in L],
        "pixel_L_err": [round(float(v), 4) for v in px_L_err],
    }, "winners": {}}

    rs = {}
    for name, path in WINNERS.items():
        if not os.path.exists(os.path.join(ROOT, path)):
            print(f"[skip] {name}: {path} missing")
            continue
        tr = Trainer(build(), TrainConfig(save_best=False))
        tree, _ = load_checkpoint(os.path.join(ROOT, path),
                                  {"model": tr.model,
                                   "opt_state": tr.opt_state,
                                   "key": tr.key})
        (x_hat, z_hat, l_hat), _ = _forecast_fwd(tree["model"],
                                                 xv[:, :CTX], t)
        z = np.asarray(z_hat)
        sign = float(np.sign(np.median(
            pearson_rows(z[:, :, 0], true_angle)))) or 1.0
        r = sign * pearson_rows(z[:, CTX:, 0], true_angle[:, CTX:])
        rs[name] = r
        L_hat = np.asarray(l_hat[1]).reshape(-1)
        order = np.argsort(r)
        rows = []
        for i in order[:5]:
            rows.append({
                "traj": int(i),
                "fc_corr_beyond": round(float(r[i]), 4),
                "sep_ratio": round(float(sep_ratio[i]), 4),
                "amplitude": round(float(amp[i]), 4),
                "L_true": round(float(L[i]), 4),
                "L_hat": round(float(L_hat[i]), 4),
                "L_err": round(float(abs(L_hat[i] - L[i])), 4),
                "pixel_L_err": round(float(px_L_err[i]), 4),
            })
            print(name, json.dumps(rows[-1]), flush=True)
        out["winners"][name] = {
            "fc_corr_beyond_median": round(float(np.median(r)), 4),
            "fc_corr_beyond_min": round(float(np.min(r)), 4),
            "worst5": rows,
            # correlation between per-trajectory difficulty and physics:
            "corr_fc_vs_sep_ratio": round(float(
                np.corrcoef(r, sep_ratio)[0, 1]), 4),
            "corr_fc_vs_amplitude": round(float(
                np.corrcoef(r, amp)[0, 1]), 4),
            "corr_fc_vs_pixel_L_err": round(float(
                np.corrcoef(r, px_L_err)[0, 1]), 4),
        }

    if len(rs) == 2:
        a, b = [rs[k] for k in WINNERS]
        m = np.isfinite(a) & np.isfinite(b)
        out["cross_winner_corr"] = round(float(
            np.corrcoef(a[m], b[m])[0, 1]), 4)
        out["shared_worst5"] = sorted(
            set(np.argsort(a)[:5].tolist())
            & set(np.argsort(b)[:5].tolist()))

    with open(os.path.join(ROOT, "benchmarks", "diag_worst_traj.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_traj"},
                     indent=1))


if __name__ == "__main__":
    main()
