"""Forecast (extrapolation) quality record for the committed flagship.

The latent-DE payoff is extrapolation past the encoder's context window:
infer (z0, theta) from the first ``context`` frames, integrate the
mechanistic latent ODE over the FULL horizon, and score reconstruction
beyond the window (the reference exercises exactly this with its
``vis_len=60 > seq_len=50`` visualization, model_train.jl:58,244-290 —
but never scores it; this harness makes it a measured, gated capability).

Metrics on the full validation split (45 videos x 100 frames):
- per-pixel MSE inside (frames 0..ctx-1) and beyond (ctx..T-1) the context,
  plus the full per-frame error curve;
- degradation factor beyond/inside;
- freeze-frame baseline: repeating the last context-window TRUE frame for
  the whole beyond-window (the "no dynamics" straw man) — the model must
  beat it by a wide margin for the extrapolation to mean anything;
- beyond-context angle correlation: the inferred mechanistic state must
  keep tracking the true pendulum angle where the encoder never looked.

Evaluation-only (no training): runs fine on CPU (--cpu) or TPU.

Usage:
    python benchmarks/forecast_quality.py --cpu          # default ckpt
    python benchmarks/forecast_quality.py --ckpt PATH --tag mytag
"""
from __future__ import annotations

import argparse
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

from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402
from latentdiffeq.train.checkpoint import load_checkpoint  # noqa: E402

from quality_goku import pearson_rows  # noqa: E402

DT = 0.05
DEFAULT_CKPT = os.path.join(ROOT, "benchmarks", "artifacts",
                            "ttg_px_winner.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument("--tag", default="forecast_quality")
    ap.add_argument("--context", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="evaluate on CPU (no training happens here)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="NN-stage dtype of the checkpointed model")
    args = ap.parse_args()

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    T = x.shape[1]
    ctx = args.context

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq, dtype=dtype)
    template = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    tr = Trainer(template, TrainConfig())
    try:
        tree, meta = load_checkpoint(args.ckpt, {"model": tr.model,
                                                 "opt_state": tr.opt_state,
                                                 "key": tr.key})
    except ValueError:
        # model-only artifact (e.g. gate-extract checkpoints)
        tree, meta = load_checkpoint(args.ckpt, {"model": tr.model})
    model = tree["model"]

    xv = jnp.asarray(val_set)
    t_full = jnp.arange(T, dtype=jnp.float32) * DT

    @jax.jit
    def run(m, xc):
        mu, _ = m.encoder(xc)
        out, aux = m.decoder(mu, t_full, key=jax.random.PRNGKey(0))
        return out, aux

    (x_hat, z_hat, l_hat), aux = run(model, xv[:, :ctx])
    x_hat = np.asarray(x_hat)
    xv_np = np.asarray(xv)

    per_frame = np.mean((xv_np - x_hat) ** 2, axis=(0, 2))   # (T,)
    inside = float(per_frame[:ctx].mean())
    beyond = float(per_frame[ctx:].mean())

    # freeze-frame straw man: hold the last TRUE context frame
    frozen = np.repeat(xv_np[:, ctx - 1:ctx], T - ctx, axis=1)
    freeze_beyond = float(np.mean((xv_np[:, ctx:] - frozen) ** 2))

    # beyond-window angle tracking (sign gauge fixed on the full horizon)
    z = np.asarray(z_hat)
    true_angle = np.asarray(val_latent)[:, :T, 0]
    sign = float(np.sign(np.median(
        pearson_rows(z[:, :, 0], true_angle)))) or 1.0
    r_beyond = sign * pearson_rows(z[:, ctx:, 0], true_angle[:, ctx:])

    record = {
        "tag": args.tag,
        "ckpt": os.path.relpath(args.ckpt, ROOT),
        "meta_epoch": meta.get("epoch"),
        "context_len": ctx,
        "horizon_len": T,
        "platform": jax.devices()[0].platform,
        "per_pixel_mse_inside": inside,
        "per_pixel_mse_beyond": beyond,
        "degradation_factor": beyond / inside,
        "freeze_frame_beyond_mse": freeze_beyond,
        "vs_freeze_frame": freeze_beyond / beyond,
        "angle_corr_beyond_median": float(np.median(r_beyond)),
        "angle_corr_beyond_min": float(np.min(r_beyond)),
        "n_val_failed": int(np.sum(~np.asarray(aux["success"]))),
        "per_frame_mse": [float(v) for v in per_frame],
    }
    out = os.path.join(ROOT, "benchmarks", f"{args.tag}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: v for k, v in record.items()
                      if k != "per_frame_mse"}, indent=2))


if __name__ == "__main__":
    main()
