"""Recurrent layers: RNN and LSTM cells + `lax.scan` runners.

TPU-native replacement for the reference's Flux recurrences (reference:
src/models/GOKU.jl:224-234 builds 2-layer relu-RNN and two 2-layer LSTM
stacks; src/models/GOKU.jl:30-49 runs them over the (reversed) sequence and
resets state). Here state is explicit and functional: each forward pass
starts from the learned initial state, so there is nothing to reset
(replaces `Flux.reset!`, reference: GOKU.jl:44-46). The time recurrence is a
single `lax.scan` whose per-step cell math XLA fuses into a couple of MXU
matmuls + VPU epilogue; an optional Pallas fused-scan kernel (ops/) can be
swapped in behind the same API.

Semantics match Flux cells:
  RNNCell:  h' = act(x @ Wi + h @ Wh + b);  output = h'
  LSTMCell: gates (input, forget, cell, output) = split(x @ Wi + h @ Wh + b)
            c' = sigmoid(f) * c + sigmoid(i) * tanh(g);  h' = sigmoid(o) * tanh(c')
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core import module, static_field
from .init import Initializer, default_init
from .layers import relu, sigmoid, tanh


@module
class RNNCell:
    Wi: jax.Array  # (in, hidden)
    Wh: jax.Array  # (hidden, hidden)
    b: jax.Array   # (hidden,)
    h0: jax.Array  # (hidden,) learned initial state (Flux `state0`)
    activation: Callable = static_field(default=relu)

    @staticmethod
    def init(key, in_dim: int, hidden_dim: int, activation: Callable = relu,
             *, winit: Initializer = default_init, dtype=jnp.float32) -> "RNNCell":
        k1, k2 = jax.random.split(key)
        return RNNCell(
            Wi=winit(k1, (in_dim, hidden_dim), dtype),
            Wh=winit(k2, (hidden_dim, hidden_dim), dtype),
            b=jnp.zeros((hidden_dim,), dtype),
            h0=jnp.zeros((hidden_dim,), dtype),
            activation=activation,
        )

    @property
    def hidden_dim(self) -> int:
        return self.Wh.shape[0]

    def initial_state(self, batch: int):
        return jnp.broadcast_to(self.h0, (batch, self.h0.shape[0]))

    def __call__(self, state, x):
        h = state
        x = x.astype(self.Wi.dtype)
        h_new = self.activation(x @ self.Wi + h @ self.Wh + self.b)
        return h_new, h_new


@module
class LSTMCell:
    Wi: jax.Array  # (in, 4*hidden)
    Wh: jax.Array  # (hidden, 4*hidden)
    b: jax.Array   # (4*hidden,)
    h0: jax.Array  # (hidden,)
    c0: jax.Array  # (hidden,)

    @staticmethod
    def init(key, in_dim: int, hidden_dim: int,
             *, winit: Initializer = default_init, dtype=jnp.float32) -> "LSTMCell":
        k1, k2 = jax.random.split(key)
        return LSTMCell(
            Wi=winit(k1, (in_dim, 4 * hidden_dim), dtype),
            Wh=winit(k2, (hidden_dim, 4 * hidden_dim), dtype),
            b=jnp.zeros((4 * hidden_dim,), dtype),
            h0=jnp.zeros((hidden_dim,), dtype),
            c0=jnp.zeros((hidden_dim,), dtype),
        )

    @property
    def hidden_dim(self) -> int:
        return self.h0.shape[0]

    def initial_state(self, batch: int):
        n = self.hidden_dim
        return (jnp.broadcast_to(self.h0, (batch, n)),
                jnp.broadcast_to(self.c0, (batch, n)))

    def __call__(self, state, x):
        h, c = state
        x = x.astype(self.Wi.dtype)
        gates = x @ self.Wi + h @ self.Wh + self.b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = sigmoid(f) * c + sigmoid(i) * tanh(g)
        h_new = sigmoid(o) * tanh(c_new)
        return (h_new, c_new), h_new


@module
class Recurrent:
    """A stack of recurrent cells run as ONE `lax.scan` over time.

    Equivalent of a Flux ``Chain(RNN(...), RNN(...))`` applied step by step
    (reference: GOKU.jl:224-234, 36-41). All layers advance inside a single
    scan step, so the whole stack is one fused loop body for XLA.

    Input ``xs``: (batch, time, in_dim). With ``reverse=True`` the sequence is
    consumed from t=T down to t=1 — the reference feeds its z0-RNN and
    backward LSTM the reversed sequence (reference: GOKU.jl:35-41), i.e. the
    Latent-ODE paper's backward encoder.
    """

    cells: Tuple

    @staticmethod
    def rnn(key, in_dim: int, hidden_dims, activation: Callable = relu,
            *, winit: Initializer = default_init, dtype=jnp.float32) -> "Recurrent":
        keys = jax.random.split(key, len(hidden_dims))
        cells, d = [], in_dim
        for k, h in zip(keys, hidden_dims):
            cells.append(RNNCell.init(k, d, h, activation, winit=winit, dtype=dtype))
            d = h
        return Recurrent(cells=tuple(cells))

    @staticmethod
    def lstm(key, in_dim: int, hidden_dims,
             *, winit: Initializer = default_init, dtype=jnp.float32) -> "Recurrent":
        keys = jax.random.split(key, len(hidden_dims))
        cells, d = [], in_dim
        for k, h in zip(keys, hidden_dims):
            cells.append(LSTMCell.init(k, d, h, winit=winit, dtype=dtype))
            d = h
        return Recurrent(cells=tuple(cells))

    def __call__(self, xs, *, reverse: bool = False,
                 return_sequence: bool = False, unroll: int = 1,
                 mask=None):
        """Run over (batch, time, in). Returns last top-layer output
        (batch, hidden), or the full (batch, time, hidden) sequence.

        ``unroll`` unrolls the time scan body that many steps per HLO loop
        iteration — identical outputs, shorter sequential issue chain (the
        TPU latency lever measured in benchmarks/perf_probe.py).

        ``mask``: optional (time,) boolean — steps where it is False leave
        the state unchanged (the cell math still runs at fixed cost; its
        result is discarded by a `where`). This is the shape-static
        building block for the single-compile masked curriculum
        (TrainConfig.masked_curriculum): a variable-length prefix of a
        fixed-length buffer is encoded by masking, so every curriculum
        length runs the SAME compiled program. The mask indexes the time
        axis of ``xs`` (it is consumed in the same order as the frames,
        for either scan direction)."""
        if mask is not None and return_sequence:
            raise NotImplementedError(
                "mask + return_sequence: masked steps have no well-defined "
                "per-step output; masked mode supports final-state reads "
                "only (all current encoder heads)")
        batch = xs.shape[0]
        init = tuple(cell.initial_state(batch) for cell in self.cells)
        xs_t = jnp.swapaxes(xs, 0, 1)  # (time, batch, in): scan over leading axis

        def step(states, x):
            if mask is not None:
                x, m = x
            new_states = []
            out = x
            for cell, st in zip(self.cells, states):
                new_st, out = cell(st, out)
                new_states.append(new_st)
            if mask is not None:
                new_states = [
                    jax.tree_util.tree_map(
                        lambda a, b: jnp.where(m, a, b), ns, st)
                    for ns, st in zip(new_states, states)]
            return tuple(new_states), (out if return_sequence else None)

        states, outs = jax.lax.scan(
            step, init, xs_t if mask is None else (xs_t, mask),
            reverse=reverse, unroll=unroll)
        if return_sequence:
            return jnp.swapaxes(outs, 0, 1)
        # Final top-layer output == final hidden state of the last cell.
        top = states[-1]
        return top[0] if isinstance(top, tuple) else top


def _advance_stack(cells, states, x):
    new_states = []
    out = x
    for cell, st in zip(cells, states):
        st, out = cell(st, out)
        new_states.append(st)
    return tuple(new_states), out


def fused_goku_heads(pe_z0: Recurrent, pe_theta_fwd: Recurrent,
                     pe_theta_bwd: Recurrent, xs, *, unroll: int = 1):
    """All three GOKU pattern-extractor heads in ONE `lax.scan`.

    Semantically identical to running the z0-RNN and backward LSTM over the
    reversed sequence and the forward LSTM over the original (reference:
    GOKU.jl:30-49), but fused: iteration t advances the forward stack on
    x[t] and the two backward stacks on x[T-1-t]. One sequential loop
    instead of three — fewer loop iterations on the TPU's critical path and
    a larger fusion region per step.

    Returns ``(z0_out, theta_out)`` with theta_out = [fwd_last ++ bwd_last].
    """
    batch = xs.shape[0]
    xs_t = jnp.swapaxes(xs, 0, 1)          # (T, B, D)
    xs_rev = jnp.flip(xs_t, axis=0)

    init = (
        tuple(c.initial_state(batch) for c in pe_z0.cells),
        tuple(c.initial_state(batch) for c in pe_theta_fwd.cells),
        tuple(c.initial_state(batch) for c in pe_theta_bwd.cells),
    )

    def step(carry, x_pair):
        st_z0, st_f, st_b = carry
        x_fwd, x_rev = x_pair
        st_f, _ = _advance_stack(pe_theta_fwd.cells, st_f, x_fwd)
        st_z0, _ = _advance_stack(pe_z0.cells, st_z0, x_rev)
        st_b, _ = _advance_stack(pe_theta_bwd.cells, st_b, x_rev)
        return (st_z0, st_f, st_b), None

    (st_z0, st_f, st_b), _ = jax.lax.scan(step, init, (xs_t, xs_rev),
                                          unroll=unroll)

    def top(states):
        t = states[-1]
        return t[0] if isinstance(t, tuple) else t

    z0_out = top(st_z0)
    theta_out = jnp.concatenate([top(st_f), top(st_b)], axis=-1)
    return z0_out, theta_out
