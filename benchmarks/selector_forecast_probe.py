"""Forecast-selector validity probe: is the pixels-only FORECAST
observable a faithful proxy for true beyond-context angle correlation?

The round-3 forecast-quality table (RESULTS.md) measured that the
in-context gate is blind to extrapolation quality: five committed gate
passers span 0.29-0.83 beyond-window true corr. Before selecting or
gating on the pixel-forecast observable
(pixel_observable.pixel_forecast_corr — encode ctx frames, integrate,
score the latent angle against the pixel-read angle on the frames the
encoder never saw), this probe scores every checkpoint in that table
with it and compares against the committed ground-truth values
(fq_*.json: angle_corr_beyond_median vs val latents).

Evaluation-only; runs on CPU (--cpu). Output:
benchmarks/selector_forecast_probe.json with per-checkpoint
(pixel_forecast, true_beyond) pairs + their Spearman rank correlation.

reference: extends the selector shoot-out protocol of
benchmarks/selector_probe.py to the extrapolation regime.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from create_data import load_or_generate  # noqa: E402
from pendulum import Pendulum  # noqa: E402
from pixel_observable import pixel_angles, pixel_forecast_corr  # noqa: E402

from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402
from latentdiffeq.train.checkpoint import load_checkpoint  # noqa: E402

DT = 0.05
CTX = 50

# (fq record tag, NN-stage dtype of the checkpoint)
TABLE = [
    ("fq_goku_pop8_winner", "f32"),
    ("fq_ttg_bf16_px_winner", "bf16"),
    ("fq_ttg_px_winner", "f32"),
    ("fq_goku_best_model", "f32"),
    ("fq_goku_bf16_gate", "bf16"),
]


def load_model(ckpt_path: str, n_pix: int, dtype):
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              n_pix, diffeq, dtype=dtype)
    template = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    tr = Trainer(template, TrainConfig())
    try:
        tree, _ = load_checkpoint(ckpt_path, {"model": tr.model,
                                              "opt_state": tr.opt_state,
                                              "key": tr.key})
    except ValueError:
        tree, _ = load_checkpoint(ckpt_path, {"model": tr.model})
    return tree["model"]


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum()
                 / (np.sqrt((ra * ra).sum() * (rb * rb).sum()) + 1e-12))


def main():
    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    th_obs = pixel_angles(val_set)

    rows = []
    for tag, dtype_name in TABLE:
        with open(os.path.join(ROOT, "benchmarks", f"{tag}.json")) as f:
            rec = json.load(f)
        dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        model = load_model(os.path.join(ROOT, rec["ckpt"]), x.shape[-1],
                           dtype)
        px = pixel_forecast_corr(model, val_set, th_obs, DT, CTX)
        rows.append({
            "tag": tag, "ckpt": rec["ckpt"], "dtype": dtype_name,
            "pixel_forecast_corr": round(px, 4),
            "true_beyond_corr": round(rec["angle_corr_beyond_median"], 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    px = np.asarray([r["pixel_forecast_corr"] for r in rows])
    tr_ = np.asarray([r["true_beyond_corr"] for r in rows])
    record = {
        "context_len": CTX,
        "rows": rows,
        "spearman_pixel_vs_true": round(spearman(px, tr_), 4),
        "max_abs_gap": round(float(np.max(np.abs(px - tr_))), 4),
        "platform": jax.devices()[0].platform,
    }
    out = os.path.join(ROOT, "benchmarks", "selector_forecast_probe.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in
                      ("spearman_pixel_vs_true", "max_abs_gap")}))


if __name__ == "__main__":
    main()
