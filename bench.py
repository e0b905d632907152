"""Parity-workload benchmark: GOKU-net on frictionless pendulum video.

Measures steady-state epoch wall-clock for the exact reference training
configuration (BASELINE.md): 450 traj x 100 frames x 28x28, batch 64,
seq_len 50, ADAMW(1e-3, decay 1e-3), variational ELBO, Tsit5 on the dt
grid, val loss on the full validation set every minibatch (the reference
computes it per minibatch, model_train.jl:204).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the Julia reference publishes no numbers and is not
runnable in this container (no Julia toolchain). The committed baseline in
benchmarks/cpu_baseline.json is this framework's own single-core CPU run
of the same workload — a conservative proxy (the reference's CPU path does
strictly more work per step: per-sample ForwardDiff dual-number solves +
Zygote BPTT + GPU<->CPU transfers). vs_baseline = cpu_epoch_s / epoch_s.
"""
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "pendulum"))

BASELINE_PATH = os.path.join(_REPO, "benchmarks", "cpu_baseline.json")
# 6 timed blocks: the first dispatch holds the jit compile and the first
# ~1-2 post-compile blocks run inflated while the device/tunnel warms up
# (measured in benchmarks/bench_final.json) — the median over 6 blocks is
# robust to both.
N_TIMED_EPOCHS = 150
BLOCK = 25


def run_workload(n_epochs=N_TIMED_EPOCHS, quiet=True, block=BLOCK,
                 pallas_encoder=False, interp_stride=1, unroll=None,
                 encoder_unroll=1):
    import jax
    import numpy as np
    from create_data import load_or_generate
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    from latentdiffeq.train import TrainConfig, Trainer, splitobs

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    train_set, val_set = splitobs(x, 0.9)

    # Config knobs measured in benchmarks/perf_probe.py + bench_final.json:
    # the Pallas encoder kernel LOSES end-to-end (XLA fuses this model
    # better); solver-scan unroll=49 is the winner — identical training
    # math (bitwise-equal final loss across the sweep), ~2x faster epochs
    # on TPU. CPU keeps unroll=1 (the committed proxy baseline's config;
    # full unroll bloats CPU compile for no win).
    if unroll is None:
        unroll = 49 if jax.devices()[0].platform == "tpu" else 1
    diffeq = Pendulum(options=make_options(
        adaptive=False, substeps=1, interp_stride=interp_stride,
        unroll=unroll))
    mt = GOKUBasic(use_pallas_encoder=pallas_encoder,
                   encoder_unroll=encoder_unroll)
    enc, dec = default_layers(jax.random.PRNGKey(333), mt,
                              x.shape[-1], diffeq)
    model = LatentDiffEqModel.build(mt, enc, dec)

    cfg = TrainConfig(epochs=1500, save_best=False,
                      epochs_per_dispatch=block)
    tr = Trainer(model, cfg)
    hist = tr.fit(train_set, val_set, epochs=block + n_epochs,
                  verbose=not quiet)
    # drop the first dispatch block (holds the jit compile)
    epochs = [h["epoch_s"] for h in hist[block:]]
    rhs = [h["rhs_evals_per_s"] for h in hist[block:]]
    return {
        "epoch_s": float(np.median(epochs)),
        "rhs_evals_per_s": float(np.median(rhs)),
        "final_train_loss": hist[-1]["train_loss"],
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def _measure_cpu_baseline():
    """Measure the CPU proxy baseline in a subprocess (the TPU platform is
    force-selected by sitecustomize, so CPU needs a config-level switch in
    a fresh interpreter)."""
    # per-epoch dispatch (block=1) is the CPU's faster configuration — the
    # 25-epoch fused block compiles poorly on CPU; use the CPU's best.
    code = (
        "import json, jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.path.insert(0, {_REPO!r});"
        "import bench; "
        "print('BASELINE='+json.dumps(bench.run_workload(3, block=1)))"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("BASELINE="):
            return json.loads(line[len("BASELINE="):])
    raise RuntimeError(f"cpu baseline failed: {out.stderr[-2000:]}")


def main():
    if "--smoke" in sys.argv:
        # CI contract check: tiny run, same one-line JSON output shape.
        result = run_workload(n_epochs=1, block=1)
        print(json.dumps({
            "metric": "goku_pendulum_epoch_wallclock",
            "value": round(result["epoch_s"], 5), "unit": "s/epoch",
            "vs_baseline": 1.0,
            "extra": {"smoke": True, "platform": result["platform"]},
        }))
        return
    result = run_workload()

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)
    else:
        baseline = _measure_cpu_baseline()
        os.makedirs(os.path.dirname(BASELINE_PATH), exist_ok=True)
        with open(BASELINE_PATH, "w") as f:
            json.dump(baseline, f, indent=2)

    vs = baseline["epoch_s"] / result["epoch_s"]
    print(json.dumps({
        "metric": "goku_pendulum_epoch_wallclock",
        "value": round(result["epoch_s"], 5),
        "unit": "s/epoch",
        "vs_baseline": round(vs, 3),
        "extra": {
            "rhs_evals_per_s": round(result["rhs_evals_per_s"]),
            "platform": result["platform"],
            "baseline_platform": baseline.get("platform", "cpu"),
            "baseline_epoch_s": round(baseline["epoch_s"], 5),
        },
    }))


if __name__ == "__main__":
    main()
