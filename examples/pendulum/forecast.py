"""Forecasting demo: condition on 50 frames, predict 100.

Loads the best GOKU checkpoint, encodes only the FIRST 50 frames of each
validation video, integrates the inferred mechanistic dynamics over the
full 100-frame horizon, and reports reconstruction error inside vs beyond
the context window. The mechanistic latent ODE is what makes the
extrapolation stable — this is the GOKU-net use case.

Usage: python forecast.py [--ckpt PATH]
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pendulum import Pendulum  # noqa: E402
from create_data import load_or_generate  # noqa: E402

from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default=os.path.join(here, "output", "best_model.npz"))
    ap.add_argument("--context", type=int, default=50)
    args = ap.parse_args()

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    full_len = x.shape[1]

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(333), GOKUBasic(),
                              x.shape[-1], diffeq)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    tr = Trainer(model, TrainConfig())
    tr.restore(args.ckpt)

    t_full = jnp.arange(full_len, dtype=jnp.float32) * 0.05
    xv = jnp.asarray(val_set)

    x_hat, z_hat, l_hat = jax.jit(
        lambda m, xc: m.forecast(xc, t_full))(tr.model,
                                              xv[:, :args.context])
    err = np.asarray(jnp.mean((xv - x_hat) ** 2, axis=(0, 2)))  # per frame
    inside = err[:args.context].mean()
    beyond = err[args.context:].mean()
    print(f"per-pixel MSE inside context (frames 0-{args.context - 1}): "
          f"{inside:.5f}")
    print(f"per-pixel MSE beyond context (frames {args.context}-"
          f"{full_len - 1}): {beyond:.5f}")
    print(f"degradation factor: {beyond / inside:.2f}x")


if __name__ == "__main__":
    main()
