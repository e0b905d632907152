"""From-scratch optimizers: ADAM, ADAMW (Flux semantics), AdaBelief.

The reference trains with Flux's ``ADAMW(eta, (0.9, 0.999), decay)``
(model_train.jl:138) and ``ADAM``/``AdaBelief`` in the original-data script
(model_train_original_data.jl:115-118). Semantics note: Flux's ADAMW is
``Optimiser(ADAM(eta, beta), WeightDecay(decay))`` — the weight-decay term
is added to the update *after* Adam rescaling and is NOT multiplied by the
learning rate (update = adam_update + decay * param). That differs from
optax/PyTorch AdamW (decay * lr); ``scale_decay_by_lr`` selects the
convention (default False = Flux parity).

API: optax-style pure transforms — ``opt.init(params) -> state``,
``opt.update(grads, state, params) -> (updates, state)``, and
``apply_updates(params, updates) = params - updates`` (descent deltas).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["adam", "adamw", "adabelief", "sgd", "apply_updates",
           "Optimizer", "clip_by_global_norm", "chain"]

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable
    update: Callable  # (grads, state, params) -> (updates, state)


def apply_updates(params, updates):
    """params <- params - updates (updates are descent deltas,
    like Flux's ``update!(opt, ps, gs)``)."""
    return _tmap(lambda p, u: p - u.astype(p.dtype), params, updates)


def sgd(lr: float) -> Optimizer:
    def init(params):
        return ()

    def update(grads, state, params=None):
        return _tmap(lambda g: lr * g, grads), state

    return Optimizer(init, update)


def adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> Optimizer:
    """Adam with bias correction, matching Flux 0.13's ADAM (the corrected
    update ``mt / (1-b1^t) / (sqrt(vt / (1-b2^t)) + eps) * lr``)."""

    def init(params):
        return {
            "m": _tmap(jnp.zeros_like, params),
            "v": _tmap(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        t = state["t"] + 1
        m = _tmap(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = _tmap(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"],
                  grads)
        c1 = 1 - b1 ** t.astype(jnp.float32)
        c2 = 1 - b2 ** t.astype(jnp.float32)
        updates = _tmap(
            lambda m_, v_: lr * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps), m, v)
        return updates, {"m": m, "v": v, "t": t}

    return Optimizer(init, update)


def adamw(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
          decay: float = 0.0, eps: float = 1e-8,
          scale_decay_by_lr: bool = False) -> Optimizer:
    """Decoupled weight decay. Default (``scale_decay_by_lr=False``) matches
    Flux's ADAMW exactly: update = adam(g) + decay * p
    (reference: model_train.jl:138 uses ADAMW(1e-3, (0.9, 0.999), 0.001))."""
    base = adam(lr, b1, b2, eps)
    wd = decay * lr if scale_decay_by_lr else decay

    def update(grads, state, params):
        updates, state = base.update(grads, state, params)
        updates = _tmap(lambda u, p: u + wd * p, updates, params)
        return updates, state

    return Optimizer(base.init, update)


def adabelief(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> Optimizer:
    """AdaBelief (Zhuang et al. 2020), Flux 0.13 semantics (no bias
    correction): s tracks (g - m)^2; update = lr * m / (sqrt(s) + eps)."""

    def init(params):
        return {
            "m": _tmap(jnp.zeros_like, params),
            "s": _tmap(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        m = _tmap(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        s = _tmap(lambda s_, m_, g: b2 * s_ + (1 - b2) * (g - m_) ** 2,
                  state["s"], m, grads)
        updates = _tmap(lambda m_, s_: lr * m_ / (jnp.sqrt(s_) + eps), m, s)
        return updates, {"m": m, "s": s}

    return Optimizer(init, update)


def clip_by_global_norm(max_norm: float) -> Optimizer:
    """Gradient clipping transform (compose with `chain`)."""

    def init(params):
        return ()

    def update(grads, state, params=None):
        leaves = jax.tree_util.tree_leaves(grads)
        norm = jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
        return _tmap(lambda g: g * scale, grads), state

    return Optimizer(init, update)


def chain(*opts: Optimizer) -> Optimizer:
    """Sequential composition (Flux's ``Optimiser(...)``)."""

    def init(params):
        return tuple(o.init(params) for o in opts)

    def update(grads, state, params=None):
        new_states = []
        for o, s in zip(opts, state):
            grads, s = o.update(grads, s, params)
            new_states.append(s)
        return grads, tuple(new_states)

    return Optimizer(init, update)
