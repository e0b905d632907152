"""Worker for the 2-process `jax.distributed` test (run by
tests/test_distributed.py, one subprocess per rank — NOT collected by
pytest).

Each rank initializes the distributed runtime through
`latentdiffeq.parallel.initialize_distributed` (the multi-host entry point,
SURVEY.md §2.5), builds the GLOBAL 2-device mesh (one CPU device per
process), assembles its local shard of the batch into a global array, and
runs one `make_dp_train_step` — the gradient allreduce crosses the process
boundary. Rank 0 saves the updated model for the parent to compare against
a single-process run of the same step.
"""
import json
import os
import sys

import jax

# CPU before any backend init (the axon sitecustomize would otherwise
# claim the TPU chip — in BOTH processes)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    out = sys.argv[4]

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "pendulum"))
    from latentdiffeq.parallel import initialize_distributed

    try:
        n = initialize_distributed(coordinator_address=coord,
                                   num_processes=nproc, process_id=rank,
                                   initialization_timeout=60)
    except Exception as e:  # environment forbids the coordinator handshake
        print(f"DISTRIBUTED_SKIP: {type(e).__name__}: {e}", flush=True)
        sys.exit(42)

    assert jax.process_count() == nproc, jax.process_count()
    assert n == nproc, f"expected {nproc} global devices, got {n}"

    import numpy as np
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

    mesh = make_mesh()           # GLOBAL mesh: one device per process
    assert mesh.size == nproc
    step = make_dp_train_step(opt, mesh, seq_len=8, dt=0.05)

    # deterministic global batch; each process holds its own half
    x = np.random.default_rng(0).random((16, 12, D)).astype(np.float32)
    per = x.shape[0] // nproc
    local = x[rank * per:(rank + 1) * per]
    xg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)

    model2, opt_state2, metrics = step(model, opt_state, xg,
                                       jax.random.PRNGKey(5),
                                       jax.numpy.asarray(0.5))
    jax.block_until_ready(model2)

    if rank == 0:
        leaves = [np.asarray(v) for v in
                  jax.tree_util.tree_leaves(jax.device_get(model2))]
        np.savez(out, *leaves)
        with open(out + ".meta.json", "w") as f:
            json.dump({"loss": float(metrics["loss"]),
                       "process_count": jax.process_count()}, f)
    print(f"RANK_{rank}_OK", flush=True)


if __name__ == "__main__":
    main()
