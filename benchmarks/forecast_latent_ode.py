"""Forecast (extrapolation) quality record for the LatentODE d8 winner.

Counterpart of forecast_quality.py for the NEURAL latent-dynamics model:
encode the first ``context`` frames, integrate the trained NODE field over
the FULL horizon, and score the frames the encoder never saw.
Extrapolation is the Latent-ODE paper's headline capability (reference:
src/models/LatentODE.jl:61-78 — the ODE solve is exactly what lets the
model predict past the observation window); this harness measures it on
the committed dim-8 winner (quality_latent_ode_d8_pop4.json — the round-3
architecture sweep's global-chart winner).

Angle readout: the neural latent has no mechanistic angle axis, so the
chart is decoded per trajectory with an affine map FITTED ON THE
IN-CONTEXT FRAMES ONLY (z[:, :ctx] vs true angle[:, :ctx]) and applied to
the beyond-window latents — no beyond-context ground truth leaks into the
readout, so beyond-window correlation measures whether the learned
DYNAMICS carry the chart forward, exactly parallel to GOKU's fixed
mechanical chart. (The round-3 finding: at dim 8 the chart is global and
essentially linear per trajectory, per-traj affine R^2 0.9987.)

Pixel-space metrics (per-frame MSE, freeze-frame straw man) follow
forecast_quality.py verbatim for cross-model comparability.

Usage:
    python benchmarks/forecast_latent_ode.py --cpu   # default d8 ckpt
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

from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402
from latentdiffeq.train.checkpoint import load_checkpoint  # noqa: E402

from quality_goku import pearson_rows  # noqa: E402
from quality_variants import build_model_keyed  # noqa: E402

DT = 0.05
DEFAULT_CKPT = os.path.join(ROOT, "benchmarks", "artifacts",
                            "latent_ode_d8_winner.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument("--tag", default="fq_latent_ode_d8")
    ap.add_argument("--context", type=int, default=50)
    ap.add_argument("--latent-dim", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    T = x.shape[1]
    ctx = args.context

    template = build_model_keyed("latent_ode", x.shape[-1],
                                 jax.random.PRNGKey(1),
                                 latent_dim=args.latent_dim)
    tr = Trainer(template, TrainConfig())
    try:
        tree, meta = load_checkpoint(args.ckpt, {"model": tr.model,
                                                 "opt_state": tr.opt_state,
                                                 "key": tr.key})
    except ValueError:
        tree, meta = load_checkpoint(args.ckpt, {"model": tr.model})
    model = tree["model"]

    xv = jnp.asarray(val_set)
    t_full = jnp.arange(T, dtype=jnp.float32) * DT

    @jax.jit
    def run(m, xc):
        mu, _ = m.encoder(xc)
        out, aux = m.decoder(mu, t_full, key=jax.random.PRNGKey(0))
        return out, aux

    (x_hat, z_hat, _), aux = run(model, xv[:, :ctx])
    x_hat = np.asarray(x_hat)
    xv_np = np.asarray(xv)

    per_frame = np.mean((xv_np - x_hat) ** 2, axis=(0, 2))   # (T,)
    inside = float(per_frame[:ctx].mean())
    beyond = float(per_frame[ctx:].mean())
    frozen = np.repeat(xv_np[:, ctx - 1:ctx], T - ctx, axis=1)
    freeze_beyond = float(np.mean((xv_np[:, ctx:] - frozen) ** 2))

    # per-trajectory affine chart decode, fitted IN-CONTEXT only
    z = np.asarray(z_hat)                           # (n, T, d)
    true_angle = np.asarray(val_latent)[:, :T, 0]
    r_beyond, r2_in = [], []
    for i in range(z.shape[0]):
        zi_in = z[i, :ctx]
        Ai = np.concatenate([zi_in, np.ones((ctx, 1))], axis=1)
        yi = true_angle[i, :ctx]
        wi = np.linalg.solve(Ai.T @ Ai + 1e-3 * np.eye(Ai.shape[1]),
                             Ai.T @ yi)
        pred_in = Ai @ wi
        r2_in.append(1.0 - np.sum((yi - pred_in) ** 2)
                     / (np.sum((yi - yi.mean()) ** 2) + 1e-12))
        zi_out = z[i, ctx:]
        pred_out = np.concatenate(
            [zi_out, np.ones((T - ctx, 1))], axis=1) @ wi
        r_beyond.append(float(pearson_rows(
            pred_out[None], true_angle[i, ctx:][None])[0]))
    r_beyond = np.asarray(r_beyond)

    record = {
        "tag": args.tag,
        "ckpt": os.path.relpath(args.ckpt, ROOT),
        "meta_epoch": meta.get("epoch"),
        "context_len": ctx,
        "horizon_len": T,
        "latent_dim": args.latent_dim,
        "platform": jax.devices()[0].platform,
        "angle_readout": "per-trajectory affine, fitted on in-context "
                         "frames only",
        "incontext_affine_r2_median": float(np.median(r2_in)),
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
