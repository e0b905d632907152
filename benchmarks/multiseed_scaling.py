"""Population-training scaling: S seeds in one vmapped program (TPU).

The flagship batch-64 step runs at 0.97 % MFU (RESULTS.md) — latency-
bound, the chip mostly idle. MultiSeedTrainer stacks S full training
replicas into the same fused epoch-block program; this measures what S
seeds cost relative to one (ideal: flat — the seed axis rides the unused
parallelism; the reference would pay S sequential runs).

Writes benchmarks/multiseed_scaling.json.
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
from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                splitobs)


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    _, _, _, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)
    diffeq = Pendulum(options=make_options(
        adaptive=False, substeps=1, unroll=49 if on_tpu else 1))

    def init_fn(k):
        enc, dec = default_layers(k, GOKUBasic(), x.shape[-1], diffeq)
        return LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    results = {}
    for S in (1, 2, 4, 8):
        cfg = TrainConfig(epochs=150, seed=333, save_best=False,
                          epochs_per_dispatch=25)
        ms = MultiSeedTrainer(init_fn, cfg, list(range(333, 333 + S)))
        t0 = time.perf_counter()
        ms.fit(train_set, val_set, epochs=25, verbose=False)  # compile blk
        compile_s = time.perf_counter() - t0
        ms.fit(train_set, val_set, epochs=150, verbose=False)
        per_ep = float(np.median([r["epoch_s"] for r in ms.history[25:]]))
        results[S] = {"epoch_s": per_ep, "compile_s": compile_s,
                      "seed_epochs_per_s": S / per_ep}
        print(f"S={S}: {per_ep * 1e3:8.2f} ms/epoch  "
              f"({per_ep / results[1]['epoch_s']:.2f}x vs S=1; ideal {S}x "
              f"for sequential)  compile {compile_s:.1f}s", flush=True)

    out = os.path.join(_REPO, "benchmarks", "multiseed_scaling.json")
    with open(out, "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "workload": "flagship GOKU pendulum, batch 64, seq 50, "
                               "fused 25-epoch blocks",
                   "results": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
