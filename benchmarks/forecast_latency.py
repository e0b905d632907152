"""Serving latency: batched GOKU forecast (TPU).

The production inference surface is `model.forecast` — encode a context
window, integrate the identified mechanistic dynamics over a longer
horizon, decode frames (the GOKU-net use case; examples/pendulum/
forecast.py). This measures the jitted end-to-end path on the committed
best checkpoint: context 50 frames -> 100-frame horizon, 28x28 output.

Writes benchmarks/forecast_latency.json.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from create_data import load_or_generate  # noqa: E402
from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer  # noqa: E402

CKPT = os.path.join(_REPO, "benchmarks", "artifacts",
                    "goku_best_model.npz")
CONTEXT, HORIZON = 50, 100
REPS = 100


def main():
    _, _, _, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)

    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              x.shape[-1], diffeq)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    tr = Trainer(model, TrainConfig(save_best=False))
    tr.restore(CKPT)
    model = tr.model

    t_full = jnp.arange(HORIZON, dtype=jnp.float32) * 0.05

    @jax.jit
    def forecast(m, ctx):
        return m.forecast(ctx, t_full)

    results = {}
    for B in (45, 256, 1024):
        reps = int(np.ceil(B / x.shape[0]))
        ctx = jnp.asarray(np.tile(x[:, :CONTEXT], (reps, 1, 1))[:B])
        out = forecast(model, ctx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = forecast(model, ctx)
        jax.block_until_ready(out)
        lat = (time.perf_counter() - t0) / REPS
        results[B] = {"latency_ms": lat * 1e3,
                      "trajectories_per_s": B / lat}
        print(f"batch {B:5d}: {lat * 1e3:7.2f} ms "
              f"({B / lat:10,.0f} trajectories/s)", flush=True)

    with open(os.path.join(_REPO, "benchmarks",
                           "forecast_latency.json"), "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "context": CONTEXT, "horizon": HORIZON,
                   "ckpt": "benchmarks/artifacts/goku_best_model.npz",
                   "results": results}, f, indent=2)
    print("wrote benchmarks/forecast_latency.json")


if __name__ == "__main__":
    main()
