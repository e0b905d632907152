"""Chip-utilization story for the WIDE-field LatentODE regime
(VERDICT r4 item 8 / weak 6): the flagship GOKU workload is latency-bound
by construction (mfu.py: 0.97 % at batch 64 — a 2-dim mechanistic latent
can't feed the MXU); the wide NeuralODE field (d32 latent, 256-wide MLP
field) is the perf frontier with headroom, and the regime where the
Pallas whole-solve kernel wins (node_kernel_bench.json: 1.2-2.7x on the
grad step). This measures MFU/roofline for the FULL LatentODE train step
there, XLA path vs Pallas kernel path, per batch size.

Run on the TPU:  python benchmarks/mfu_wide.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from mfu import peak_for

LATENT = 32
HIDDEN = 256
SEQ = 50
INPUT = 784


def build_step(batch, use_pallas):
    from latentdiffeq import make_options
    from latentdiffeq.models import (LatentDiffEqModel, LatentODE, NODE,
                                     latent_ode_default_layers)
    from latentdiffeq.train import optim
    from latentdiffeq.train.losses import loss_batch

    k = jax.random.PRNGKey(0)
    node = NODE(k, LATENT, hidden_dim=HIDDEN,
                options=make_options(adaptive=False, substeps=1))
    enc, dec = latent_ode_default_layers(k, INPUT, node)
    model = LatentDiffEqModel.build(
        LatentODE(use_pallas_solve=use_pallas), enc, dec)
    opt = optim.adamw(1e-3, decay=1e-3)
    opt_state = opt.init(model)
    t = jnp.arange(SEQ, dtype=jnp.float32) * 0.05

    def step(model, opt_state, x, key):
        (loss, m), grads = jax.value_and_grad(
            lambda mm: loss_batch(mm, x, t, 0.5, variational=True, key=key),
            has_aux=True)(model)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optim.apply_updates(model, updates), opt_state, loss

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, SEQ, INPUT))
    return step, (model, opt_state, x, jax.random.PRNGKey(2))


def measure(batch, use_pallas, reps=20, flops_override=None):
    step, args = build_step(batch, use_pallas)
    compiled = jax.jit(step).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    # XLA's cost model cannot see inside a Pallas custom call, so the
    # kernel path reuses the XLA twin's FLOP count (identical math —
    # forward bit-exact, tests/test_pallas_ops.py)
    if flops_override is not None:
        flops = flops_override

    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    dev = jax.devices()[0]
    peak = peak_for(dev)
    row = {
        "workload": f"latent_ode_d{LATENT}_w{HIDDEN}",
        "pallas": use_pallas,
        "flops_from_xla_twin": flops_override is not None,
        "batch": batch,
        "step_ms": round(dt * 1e3, 3),
        "samples_per_s": round(batch / dt),
        "gflops_per_step": round(flops / 1e9, 3),
        "achieved_gflops_per_s": round(flops / dt / 1e9, 1),
        "mfu_pct": round(100.0 * flops / dt / peak, 4),
        "arith_intensity_flops_per_byte": round(flops / max(bytes_, 1), 2),
        "bytes_accessed_mb": round(bytes_ / 2**20, 1),
        "device": str(dev),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    for batch in (64, 256, 1024):
        xla_row = measure(batch, False)
        rows.append(xla_row)
        rows.append(measure(batch, True,
                            flops_override=xla_row["gflops_per_step"] * 1e9))
    with open(os.path.join(ROOT, "benchmarks", "mfu_wide.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
