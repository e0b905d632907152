"""Production-scale throughput: GOKU train step vs batch size.

The parity workload (batch 64, 784 pixels) barely feeds the MXU; this
sweep measures samples/s as the batch grows — the regime a production
deployment actually runs in (prompt: "large-scale production deployment").

Usage: python benchmarks/throughput_scaling.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

import jax
import jax.numpy as jnp
import numpy as np

from pendulum import Pendulum
from latentdiffeq import make_options
from latentdiffeq.models import GOKUBasic, LatentDiffEqModel, default_layers
from latentdiffeq.train import optim
from latentdiffeq.train.losses import loss_batch


def run(dtype=jnp.float32, label="fp32"):
    on_tpu = jax.devices()[0].platform == "tpu"
    # round-2 winning config (benchmarks/bench_final.json): solver-scan
    # unroll, Pallas kernels off (measured slower end-to-end)
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1,
                                           unroll=49 if on_tpu else 1))
    mt = GOKUBasic()
    enc, dec = default_layers(jax.random.PRNGKey(0), mt, 784, diffeq,
                              dtype=dtype)
    model = LatentDiffEqModel.build(mt, enc, dec)
    opt = optim.adamw(1e-3, decay=1e-3)
    opt_state = opt.init(model)
    seq_len = 50
    t = jnp.arange(seq_len, dtype=jnp.float32) * 0.05

    @jax.jit
    def step(model, opt_state, x, key):
        (_, m), g = jax.value_and_grad(
            lambda mm: loss_batch(mm, x, t, jnp.float32(0.5),
                                  variational=True, key=key),
            has_aux=True)(model)
        u, opt_state = opt.update(g, opt_state, model)
        return optim.apply_updates(model, u), opt_state, m["loss"]

    print(f"platform: {jax.devices()[0].platform}  seq_len={seq_len}  "
          f"dtype={label}")
    results = {}
    for batch in (64, 256, 1024, 4096):
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, seq_len, 784),
                               dtype=dtype)
        key = jax.random.PRNGKey(2)
        m, o, loss = step(model, opt_state, x, key)
        jax.block_until_ready(loss)
        n = 20
        t0 = time.perf_counter()
        mm, oo = model, opt_state
        for _ in range(n):
            mm, oo, loss = step(mm, oo, x, key)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / n
        sps = batch / dt
        results[batch] = (dt, sps)
        print(f"  batch {batch:5d}: step {dt * 1e3:8.2f} ms  "
              f"{sps:12,.0f} samples/s", flush=True)


def main():
    run(jnp.float32, "fp32")
    # bf16 NN stages (solve stays f32): halves HBM traffic on the
    # bandwidth-bound step — the production-scale configuration
    run(jnp.bfloat16, "bf16")


if __name__ == "__main__":
    main()
