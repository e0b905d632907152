"""Data-parallel ELBO training over a device mesh.

Two equivalent implementations (BASELINE.json north star: "the ELBO loop
with KL annealing and time-window minibatching runs data-parallel with
gradient allreduce over ICI"):

1. ``make_dp_train_step`` — GSPMD style: the single-chip step jitted with
   sharding annotations. Parameters replicated, minibatch sharded on the
   ``data`` axis; XLA inserts the gradient all-reduce (psum over ICI) where
   the loss reductions cross the batch axis. This is the production path —
   the compiler overlaps the collectives with the backward pass.

2. ``make_shardmap_train_step`` — explicit SPMD: `jax.shard_map` with a
   hand-placed `lax.pmean` over the gradients. Same math, explicit
   collective; kept as the reference implementation the GSPMD path is
   tested against.

Both keep the reference's training semantics: one shared random time window
per global minibatch (utils.jl:86-94), per-sample reparameterization noise
(decorrelated across shards via fold_in on the axis index).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import optim
from ..train.losses import loss_batch

__all__ = ["make_dp_train_step", "make_shardmap_train_step"]


def _window(x, key, seq_len: int):
    full = x.shape[1]
    start = jax.random.randint(key, (), 0, max(full - seq_len, 1))
    return jax.lax.dynamic_slice_in_dim(x, start, seq_len, axis=1)


def make_dp_train_step(opt: optim.Optimizer, mesh: Mesh, *, seq_len: int,
                       dt: float, variational: bool = True,
                       loss_fn: Callable = loss_batch,
                       axis_name: str = "data"):
    """GSPMD data-parallel train step.

    Call as ``step(model, opt_state, x, key, beta)`` with ``x``:
    (global_batch, time, features) sharded (or shardable) on axis 0.
    Returns ``(model, opt_state, metrics)`` with replicated outputs.
    """
    t = jnp.arange(seq_len, dtype=jnp.float32) * dt
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit,
             in_shardings=(repl, repl, batch_sh, repl, repl),
             out_shardings=(repl, repl, repl))
    def step(model, opt_state, x, key, beta):
        kwin, kvar = jax.random.split(key)
        xw = _window(x, kwin, seq_len)
        xw = jax.lax.with_sharding_constraint(xw, batch_sh)

        def lf(m):
            return loss_fn(m, xw, t, beta, variational=variational,
                           key=kvar)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(model)
        updates, new_opt_state = opt.update(grads, opt_state, model)
        model = optim.apply_updates(model, updates)
        return model, new_opt_state, metrics

    return step


def make_shardmap_train_step(opt: optim.Optimizer, mesh: Mesh, *,
                             seq_len: int, dt: float,
                             variational: bool = True,
                             loss_fn: Callable = loss_batch,
                             axis_name: str = "data"):
    """Explicit-SPMD train step: per-shard grads + `lax.pmean` allreduce."""
    t = jnp.arange(seq_len, dtype=jnp.float32) * dt

    def _shard_step(model, opt_state, x, key, beta):
        # x: the local shard (local_batch, time, features)
        kwin, kvar = jax.random.split(key)
        # identical window on every shard (same key); decorrelated
        # per-sample noise via the axis index
        kvar = jax.random.fold_in(kvar, jax.lax.axis_index(axis_name))
        xw = _window(x, kwin, seq_len)

        def lf(m):
            return loss_fn(m, xw, t, beta, variational=variational,
                           key=kvar)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(model)
        grads = jax.lax.pmean(grads, axis_name)
        # Count-type metrics ("n_*": rhs-eval and failure counters) are
        # global SUMS over the batch — psum, matching the single-chip and
        # GSPMD paths. Loss-type metrics are batch means — pmean.
        metrics = {k: (jax.lax.psum(v, axis_name) if k.startswith("n_")
                       else jax.lax.pmean(v.astype(jnp.float32), axis_name))
                   for k, v in metrics.items()}
        updates, new_opt_state = opt.update(grads, opt_state, model)
        model = optim.apply_updates(model, updates)
        return model, new_opt_state, metrics

    shmap = jax.shard_map(
        _shard_step, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shmap)
