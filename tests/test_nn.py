"""Unit tests for nn layers: shapes, Flux-matching semantics, inits."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentdiffeq import nn
from latentdiffeq.core import tree_size


def test_kaiming_uniform_bound_and_moments():
    key = jax.random.PRNGKey(0)
    init = nn.kaiming_uniform(gain=1.0 / math.sqrt(3.0))
    W = init(key, (784, 200))
    bound = 1.0 / math.sqrt(784)  # sqrt(3)*gain/sqrt(fan_in)
    assert float(jnp.max(jnp.abs(W))) <= bound
    # Uniform(-b, b) has std b/sqrt(3)
    assert abs(float(jnp.std(W)) - bound / math.sqrt(3)) < 0.05 * bound


def test_dense_forward():
    d = nn.Dense(W=jnp.array([[1.0, 2.0], [3.0, 4.0]]),
                 b=jnp.array([0.5, -0.5]), activation=nn.identity)
    x = jnp.array([[1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(d(x)), [[4.5, 5.5]])
    d_relu = nn.Dense(W=d.W, b=jnp.array([-10.0, 0.0]), activation=nn.relu)
    np.testing.assert_allclose(np.asarray(d_relu(x)), [[0.0, 6.0]])


def test_skip_connection_and_resnet_shapes():
    key = jax.random.PRNGKey(1)
    net = nn.resnet_mlp(key, 784, 200, 32, nn.relu, nn.relu)
    x = jnp.ones((7, 784))
    y = net(x)
    assert y.shape == (7, 32)
    # skip: layer(x) + x
    sk = nn.SkipConnection(layer=nn.Dense(W=jnp.eye(3), b=jnp.zeros(3),
                                          activation=nn.identity))
    np.testing.assert_allclose(np.asarray(sk(jnp.ones((2, 3)))),
                               2 * np.ones((2, 3)))


def test_mlp_structure():
    key = jax.random.PRNGKey(2)
    net = nn.mlp(key, (16, 200, 2), nn.relu, nn.identity)
    assert len(net) == 2
    assert net[0].activation is nn.relu
    assert net[1].activation is nn.identity
    assert net(jnp.ones((5, 16))).shape == (5, 2)


def test_rnn_cell_semantics():
    # h' = act(x Wi + h Wh + b), single step hand-check
    cell = nn.RNNCell(Wi=jnp.array([[1.0]]), Wh=jnp.array([[2.0]]),
                      b=jnp.array([0.1]), h0=jnp.array([0.5]),
                      activation=nn.identity)
    st = cell.initial_state(1)
    st, out = cell(st, jnp.array([[3.0]]))
    np.testing.assert_allclose(np.asarray(out), [[3.0 + 1.0 + 0.1]])


def test_lstm_cell_against_manual():
    key = jax.random.PRNGKey(3)
    cell = nn.LSTMCell.init(key, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4))
    (h, c), out = cell(cell.initial_state(2), x)
    gates = x @ cell.Wi + jnp.zeros((2, 3)) @ cell.Wh + cell.b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_ref = jax.nn.sigmoid(f) * 0 + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_ref = jax.nn.sigmoid(o) * jnp.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-6)
    assert out is h


def test_recurrent_reverse_equals_flipped_input():
    """Feeding the reversed sequence forward == reverse=True scan
    (the reference reverses explicitly, GOKU.jl:35)."""
    key = jax.random.PRNGKey(5)
    rnn = nn.Recurrent.rnn(key, 8, (16, 16), nn.relu)
    xs = jax.random.normal(jax.random.PRNGKey(6), (3, 10, 8))
    out_rev = rnn(xs, reverse=True)
    out_flip = rnn(jnp.flip(xs, axis=1), reverse=False)
    np.testing.assert_allclose(np.asarray(out_rev), np.asarray(out_flip),
                               rtol=1e-5, atol=1e-6)


def test_recurrent_stacked_matches_manual_loop():
    key = jax.random.PRNGKey(7)
    lstm = nn.Recurrent.lstm(key, 8, (16, 16))
    xs = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 8))
    out = lstm(xs)
    # manual double-layer recurrence
    st = [cell.initial_state(2) for cell in lstm.cells]
    for t in range(5):
        x = xs[:, t]
        for li, cell in enumerate(lstm.cells):
            st[li], x = cell(st[li], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_recurrent_return_sequence():
    key = jax.random.PRNGKey(9)
    rnn = nn.Recurrent.rnn(key, 4, (6,))
    xs = jax.random.normal(jax.random.PRNGKey(10), (2, 7, 4))
    seq = rnn(xs, return_sequence=True)
    assert seq.shape == (2, 7, 6)
    np.testing.assert_allclose(np.asarray(seq[:, -1]), np.asarray(rnn(xs)),
                               rtol=1e-6)


def test_params_are_pytree_leaves():
    key = jax.random.PRNGKey(11)
    net = nn.resnet_mlp(key, 10, 20, 5)
    n = tree_size(net)
    assert n == (10 * 20 + 20) + 2 * (20 * 20 + 20) + (20 * 5 + 5)
    grads = jax.grad(lambda m: jnp.sum(m(jnp.ones((1, 10))) ** 2))(net)
    assert tree_size(grads) == n


def test_recurrent_unroll_invariant():
    """`unroll` on the recurrent runners is pure scheduling: outputs are
    identical for any factor, forward and reversed, incl. the fused heads."""
    import jax
    import jax.numpy as jnp
    from latentdiffeq import nn
    from latentdiffeq.nn.recurrent import fused_goku_heads

    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    rnn = nn.Recurrent.rnn(ks[0], 8, (6, 6), nn.relu)
    lstm = nn.Recurrent.lstm(ks[1], 8, (6, 6))
    xs = jax.random.normal(ks[2], (5, 13, 8))
    for unroll in (4, 13):
        assert jnp.array_equal(rnn(xs, unroll=unroll), rnn(xs))
        assert jnp.array_equal(lstm(xs, reverse=True, unroll=unroll),
                               lstm(xs, reverse=True))
    bwd = nn.Recurrent.lstm(ks[3], 8, (6, 6))
    z0_ref, th_ref = fused_goku_heads(rnn, lstm, bwd, xs)
    z0_u, th_u = fused_goku_heads(rnn, lstm, bwd, xs, unroll=5)
    assert jnp.array_equal(z0_ref, z0_u)
    assert jnp.array_equal(th_ref, th_u)


def test_frozen_linear_is_static_and_survives_training_updates():
    """FrozenLinear holds W, b as static metadata: no pytree leaves, so
    jax.grad never sees it and ADAMW's decoupled weight decay (which
    erodes every LEAF regardless of gradient) cannot touch it. Forward
    matches the plain computation; gradients flow THROUGH it to inputs."""
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (4, 6)))
    b = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (6,)))
    fl = nn.FrozenLinear.from_arrays(W, b, nn.relu,
                                     out_scale=0.5, out_shift=0.1)
    assert jax.tree_util.tree_leaves(fl) == []

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 4))
    ref = np.maximum(x @ W + b, 0.0) * 0.5 + 0.1
    np.testing.assert_allclose(np.asarray(fl(x)), ref, atol=1e-6)

    # grads flow through to the input (it's differentiable as a function)
    g = jax.grad(lambda xx: jnp.sum(fl(xx) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(g).max() > 0

    # an ADAMW step over a model containing it leaves it bit-identical
    from latentdiffeq.train.optim import adamw, apply_updates
    model = {"dense": nn.Dense.init(jax.random.PRNGKey(3), 4, 6),
             "frozen": fl}
    opt = adamw(1e-2, decay=0.1)
    state = opt.init(model)

    def loss(m):
        return jnp.sum(m["dense"](x) ** 2) + jnp.sum(m["frozen"](x) ** 2)

    grads = jax.grad(loss)(model)
    updates, state = opt.update(grads, state, model)
    new = apply_updates(model, updates)
    assert new["frozen"] is not None
    assert new["frozen"].data == fl.data
    assert not np.array_equal(np.asarray(new["dense"].W),
                              np.asarray(model["dense"].W))
