"""End-to-end epoch cost of the wide-field NeuralODE kernel (TPU).

node_kernel_bench.py measures the isolated solve; this trains the FULL
LatentODE model (encoder -> NODE(128) solve -> decoder, ELBO, ADAMW)
on the flagship pendulum video with `use_pallas_solve` off vs on —
the epoch-level claim behind RESULTS.md "where Pallas pays".

Writes benchmarks/wide_latent_epoch.json.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from create_data import load_or_generate  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (LatentODE, LatentDiffEqModel, NODE,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402

BLOCK = 25
EPOCHS = 100  # first block holds the compile; median over the rest


def run(use_pallas: bool) -> dict:
    k = jax.random.PRNGKey(1)
    kn, k = jax.random.split(k)
    node = NODE(kn, 128, hidden_dim=256,
                options=make_options(adaptive=False, substeps=1))
    mt = LatentODE(use_pallas_solve=use_pallas)
    _, _, _, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)
    enc, dec = default_layers(k, mt, x.shape[-1], node)
    model = LatentDiffEqModel.build(mt, enc, dec)
    cfg = TrainConfig(epochs=EPOCHS, seed=1, save_best=False,
                      epochs_per_dispatch=BLOCK)
    tr = Trainer(model, cfg)
    t0 = time.perf_counter()
    hist = tr.fit(train_set, val_set, verbose=False)
    total = time.perf_counter() - t0
    eps = [h["epoch_s"] for h in hist[BLOCK:]]
    return {"epoch_s": float(np.median(eps)), "total_s": total,
            "final_val": float(hist[-1]["val_loss"])}


def main():
    res = {"xla": run(False), "pallas": run(True)}
    res["epoch_speedup"] = res["xla"]["epoch_s"] / res["pallas"]["epoch_s"]
    for k2, v in res.items():
        print(k2, v, flush=True)
    out = os.path.join(_REPO, "benchmarks", "wide_latent_epoch.json")
    with open(out, "w") as f:
        json.dump({"workload": "LatentODE + NODE(128,h256), pendulum video,"
                               " batch 64, seq 50, fused 25-epoch blocks",
                   "platform": jax.devices()[0].platform, **res}, f,
                  indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
