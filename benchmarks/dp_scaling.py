"""Data-parallel scaling check on the virtual-CPU mesh (BASELINE.json
config 5: multi-chip long-horizon multi-trajectory training).

Weak scaling: global batch = 16 * n_devices, so per-device work is constant;
perfect scaling keeps step time flat as devices double. On the virtual CPU
mesh all "devices" share one core, so this validates *sharding mechanics and
collective placement*, not real speedup — on a TPU pod slice the same
program rides ICI.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/dp_scaling.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# Decide the platform BEFORE any jax.devices() call initializes a backend
# (the axon sitecustomize overrides JAX_PLATFORMS via jax.config).
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.parallel import (make_dp_train_step, make_mesh,  # noqa: E402
                                   replicate, shard_batch)
from latentdiffeq.train import optim  # noqa: E402


def main():
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), 784,
                              diffeq)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    opt = optim.adamw(1e-3, decay=1e-3)

    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        model_r, opt_r = replicate((model, opt.init(model)), mesh)
        batch = 16 * n_dev
        x = shard_batch(jnp.asarray(np.random.default_rng(0).random(
            (batch, 100, 784), dtype=np.float32)), mesh)
        step = make_dp_train_step(opt, mesh, seq_len=50, dt=0.05)
        args = (model_r, opt_r, x, jax.random.PRNGKey(0), jnp.float32(0.5))
        out = jax.block_until_ready(step(*args))  # compile
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = step(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"  n_dev={n_dev}  global_batch={batch:3d}  "
              f"step {dt * 1e3:8.1f} ms  loss {float(out[2]['loss']):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
