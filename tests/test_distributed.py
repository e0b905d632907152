"""Multi-host path: a REAL 2-process `jax.distributed` cluster.

`latentdiffeq.parallel.initialize_distributed` wraps
`jax.distributed.initialize` (SURVEY.md §2.5 — the distributed backend the
reference has no equivalent of). This test spawns two CPU processes, runs
the coordinator handshake, builds the global 2-device mesh, executes one
data-parallel train step whose gradient allreduce crosses the process
boundary, and asserts the result matches the same step run single-process.
Skips cleanly if the environment forbids the local socket handshake.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same one train step on one local device (any process count
    only changes the gradient reduction order — f32 rounding)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from latentdiffeq.parallel import make_mesh, make_dp_train_step
    from latentdiffeq.train import optim
    from pendulum import Pendulum
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)

    D = 32
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(), D, diffeq,
                              hidden_dim_resnet=16, latent_to_diffeq_dim=16)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)
    opt = optim.adamw(1e-3, 0.9, 0.999, 1e-3)
    opt_state = opt.init(model)

    mesh = make_mesh(1)
    step = make_dp_train_step(opt, mesh, seq_len=8, dt=0.05)
    x = np.random.default_rng(0).random((16, 12, D)).astype(np.float32)
    xg = jax.device_put(x, NamedSharding(mesh, P("data")))
    model2, _, metrics = step(model, opt_state, xg, jax.random.PRNGKey(5),
                              jax.numpy.asarray(0.5))
    leaves = [np.asarray(v) for v in
              jax.tree_util.tree_leaves(jax.device_get(model2))]
    return leaves, float(metrics["loss"])


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = str(tmp_path / "rank0_model.npz")

    env = dict(os.environ)
    # one local CPU device per process (the parent's 8-virtual-device flag
    # must not leak into the workers)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""  # worker pins cpu via jax.config anyway

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", coord, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(WORKER)))
        for rank in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process cluster timed out (coordinator "
                        "handshake or collective hang)")
        outputs.append(o)

    if any(p.returncode == 42 for p in procs):
        pytest.skip("environment forbids jax.distributed handshake: "
                    + "".join(outputs)[-300:])
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"rank failed:\n{o[-2000:]}"
    assert "RANK_0_OK" in outputs[0] and "RANK_1_OK" in outputs[1]

    meta = json.load(open(out + ".meta.json"))
    assert meta["process_count"] == 2

    ref_leaves, ref_loss = _single_process_reference()
    with np.load(out) as data:
        got = [data[k] for k in data.files]
    assert len(got) == len(ref_leaves)
    for a, b in zip(got, ref_leaves):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(meta["loss"], ref_loss, rtol=1e-5)
