"""Refinement-consistent Brownian paths: bridge increments + virtual tree.

The reference's stochastic pendulum is solved with ``SOSRI()`` — an adaptive
strong-order-1.5 SRI method (reference:
examples/pendulum_friction-less/pendulum.jl:103). High-order SRA/SRI methods
consume not just the increments ``dW`` but the space-time integrals
``I(1,0) = int_t^{t+h} (W(s) - W(t)) ds``, and adaptive stepping requires the
Brownian path to be a *fixed function of the PRNG key* so that changing the
step sequence (or a fixed-grid ``substeps`` refinement) samples the SAME
path rather than a new one. StochasticDiffEq gets this with a mutable
rejection-stack (RSwM); the TPU-native equivalent here is a **virtual
Brownian tree** (the same device diffrax uses, for the same reason): every
dyadic cell's ``(dW, I(1,0))`` is obtained by recursive conditional
bisection keyed on (interval, level, node), so any two traversals agree
exactly and no state is carried.

Bisection law (derived from the joint Gaussian of ``(W(h/2), I_half)``
conditioned on ``(W(h), I) = (w, i)``; the conditional covariance comes out
diagonal):

    W_left  ~ N( -w/4 + (3/(2h)) i,  h/16   )
    I_left  ~ N( -(h/8) w + i/2,     h^3/192 )
    W_right = w - W_left
    I_right = i - I_left - (h/2) W_left      (relative to the midpoint)

Root law over a cell of width h: ``W ~ N(0, h)``,
``I | W ~ N(W h/2, h^3/12)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interval_root", "bridge_split", "bridge_increments",
           "vbt_query"]


def interval_root(key, h, shape, dtype=jnp.float32):
    """Sample ``(W, I)`` for a whole cell of width ``h``.

    ``shape``: state shape (the noise is independent per state dim —
    diagonal/additive noise, matching SDEProblem's ``g`` contract)."""
    z = jax.random.normal(key, (2,) + shape, dtype)
    w = jnp.sqrt(h) * z[0]
    i = 0.5 * h * w + jnp.sqrt(h**3 / 12.0) * z[1]
    return w, i


def bridge_split(key, w, i, h):
    """Split a cell of width ``h`` with totals ``(w, i)`` into two halves.

    Returns ``(w_left, i_left, w_right, i_right)`` where the ``I`` values
    are relative to each half's own start point."""
    z = jax.random.normal(key, (2,) + w.shape, w.dtype)
    w_l = -0.25 * w + (1.5 / h) * i + jnp.sqrt(h / 16.0) * z[0]
    i_l = -(h / 8.0) * w + 0.5 * i + jnp.sqrt(h**3 / 192.0) * z[1]
    w_r = w - w_l
    i_r = i - i_l - 0.5 * h * w_l
    return w_l, i_l, w_r, i_r


def _node_key(interval_key, level, node):
    return jax.random.fold_in(jax.random.fold_in(interval_key, level), node)


def bridge_increments(key, saveat, substeps: int, shape,
                      dtype=jnp.float32):
    """Per-interval Brownian increments and space-time integrals.

    ``saveat``: (T,) save grid; each of the T-1 intervals is an independent
    root cell keyed by ``fold_in(key, interval_index)``, recursively bisected
    ``log2(substeps)`` times. Returns ``(dws, i10s)`` of shape
    (T-1, substeps, *shape).

    Refinement consistency: for the same ``key``, the path with
    ``substeps = 2m`` is a bisection of the path with ``substeps = m`` —
    pairwise sums of increments match exactly (and the law is exact at every
    refinement). ``substeps`` must be a power of two.
    """
    if substeps < 1 or (substeps & (substeps - 1)) != 0:
        raise ValueError(f"substeps must be a power of 2, got {substeps}")
    n = saveat.shape[0] - 1
    hs = (saveat[1:] - saveat[:-1]).astype(dtype)
    interval_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, jnp.arange(n))

    # roots: (n, *shape)
    w, i = jax.vmap(lambda k, h: interval_root(k, h, shape, dtype))(
        interval_keys, hs)
    w = w[:, None]   # (n, 1, *shape) — cells per interval
    i = i[:, None]
    h = hs           # cell width per interval

    level = 1
    m = 1
    while m < substeps:
        # split each of the m cells in every interval
        node_keys = jax.vmap(
            lambda ik: jax.vmap(lambda c: _node_key(ik, level, c))(
                jnp.arange(m)))(interval_keys)    # (n, m, 2) keys
        w_l, i_l, w_r, i_r = jax.vmap(
            jax.vmap(bridge_split, (0, 0, 0, None)), (0, 0, 0, 0))(
                node_keys, w, i, h / m)
        # interleave left/right: (n, 2m, ...)
        w = jnp.stack([w_l, w_r], axis=2).reshape((n, 2 * m) + shape)
        i = jnp.stack([i_l, i_r], axis=2).reshape((n, 2 * m) + shape)
        m *= 2
        level += 1
    return w, i


def vbt_query(key, interval_idx, h_interval, k, m, shape, depth_cap: int,
              dtype=jnp.float32):
    """Evaluate ``(dW, I(1,0))`` of the dyadic cell ``[m/2^k, (m+1)/2^k]``
    (relative to save interval ``interval_idx`` of width ``h_interval``) by
    descending the virtual tree. ``k`` and ``m`` may be traced values with
    ``k <= depth_cap``; the descent runs ``depth_cap`` masked iterations.

    Node keying matches :func:`bridge_increments`, so a fixed-grid solve
    with ``substeps = 2^k`` and an adaptive solve that lands on the same
    cells consume the SAME numbers.
    """
    interval_key = jax.random.fold_in(key, interval_idx)
    # root uses interval_key directly (level tags enter via fold_in below,
    # starting at 1), matching bridge_increments' root sampling
    w, i = interval_root(interval_key, h_interval, shape, dtype)

    def body(j, carry):
        w, i, h = carry
        active = j <= k
        # cell index (at level j-1) being split on our descent path
        parent = jnp.where(active, m >> (k - j + 1), 0)
        bit = jnp.where(active, (m >> (k - j)) & 1, 0)
        nk = _node_key(interval_key, j, parent)
        w_l, i_l, w_r, i_r = bridge_split(nk, w, i, h)
        w_new = jnp.where(bit == 0, w_l, w_r)
        i_new = jnp.where(bit == 0, i_l, i_r)
        w = jnp.where(active, w_new, w)
        i = jnp.where(active, i_new, i)
        h = jnp.where(active, h / 2.0, h)
        return (w, i, h)

    w, i, _ = jax.lax.fori_loop(
        1, depth_cap + 1, body,
        (w, i, jnp.asarray(h_interval, dtype)))
    return w, i
