"""Where Pallas pays: wide-NeuralODE solve kernel vs XLA (TPU).

The flagship-size kernels lose to XLA (dim-2/16 states waste the VPU
lanes; RESULTS.md "perf probe"). ops/node_pallas.py predicts the flip for
wide MLP fields: weights pinned in VMEM across the whole integration vs
XLA's per-stage weight re-streaming. This measures both paths — forward
and full grad step — across field widths and batch sizes.

Writes benchmarks/node_kernel_bench.json.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latentdiffeq import Tsit5, nn  # noqa: E402
from latentdiffeq.ops.node_pallas import pallas_solve_neural_field  # noqa: E402
from latentdiffeq.solve.fixed import solve_fixed_grid  # noqa: E402

T = 50
REPS = 100


def main():
    solver = Tsit5()
    saveat = jnp.arange(T, dtype=jnp.float32) * 0.05
    results = {}
    for dim, hidden in ((16, 200), (128, 256), (256, 256)):
        mlp = nn.mlp(jax.random.PRNGKey(0), (dim, hidden, hidden, dim),
                     nn.relu, nn.identity)
        # scale down so relu MLP dynamics stay finite over the horizon
        mlp = jax.tree_util.tree_map(lambda a: a * 0.1, mlp)

        def f(u, p, t):
            return p(u)

        def xla_fwd(mlp, u0s):
            ys, _, _ = jax.vmap(lambda u0: solve_fixed_grid(
                f, solver, u0, mlp, saveat))(u0s)
            return ys

        def pls_fwd(mlp, u0s):
            ys, _, _ = pallas_solve_neural_field(mlp, solver, u0s, saveat)
            return ys

        def xla_grad(mlp, u0s):
            return jax.grad(lambda m: jnp.sum(xla_fwd(m, u0s) ** 2))(mlp)

        def pls_grad(mlp, u0s):
            # kernel forward + in-VMEM reverse-sweep kernel backward
            def l(m):
                ys, _, _ = pallas_solve_neural_field(m, solver, u0s, saveat,
                                                     backward="pallas")
                return jnp.sum(ys ** 2)
            return jax.grad(l)(mlp)

        def pls_grad_remat(mlp, u0s):
            # kernel forward + XLA rematerialized backward
            def l(m):
                ys, _, _ = pallas_solve_neural_field(m, solver, u0s, saveat,
                                                     backward="xla")
                return jnp.sum(ys ** 2)
            return jax.grad(l)(mlp)

        for B in (256, 1024):
            u0s = jax.random.normal(jax.random.PRNGKey(1), (B, dim)) * 0.3
            row = {}
            for name, fn in (("xla_fwd", xla_fwd), ("pallas_fwd", pls_fwd),
                             ("xla_grad", xla_grad),
                             ("pallas_grad", pls_grad),
                             ("pallas_grad_remat", pls_grad_remat)):
                jfn = jax.jit(fn)
                jax.block_until_ready(jfn(mlp, u0s))  # compile
                # async-pipelined timing (perf_probe.timeit pattern): the
                # per-dispatch tunnel RTT (~30 ms) overlaps; one block at
                # the end measures device time per call
                t0 = time.perf_counter()
                out = None
                for _ in range(REPS):
                    out = jfn(mlp, u0s)
                jax.block_until_ready(out)
                row[name] = (time.perf_counter() - t0) / REPS
            row["fwd_speedup"] = row["xla_fwd"] / row["pallas_fwd"]
            row["grad_speedup"] = row["xla_grad"] / row["pallas_grad"]
            results[f"dim{dim}_h{hidden}_b{B}"] = row
            print(f"dim={dim:4d} h={hidden} B={B:5d}: "
                  f"fwd {row['xla_fwd']*1e3:7.2f} -> "
                  f"{row['pallas_fwd']*1e3:7.2f} ms "
                  f"({row['fwd_speedup']:.2f}x)   "
                  f"grad {row['xla_grad']*1e3:7.2f} -> "
                  f"{row['pallas_grad']*1e3:7.2f} ms "
                  f"({row['grad_speedup']:.2f}x)", flush=True)

    out = os.path.join(_REPO, "benchmarks", "node_kernel_bench.json")
    with open(out, "w") as fh:
        json.dump({"platform": jax.devices()[0].platform, "T": T,
                   "solver": "Tsit5", "results": results}, fh, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
