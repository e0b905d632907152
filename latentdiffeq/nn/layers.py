"""Feed-forward layers: Dense, Chain, SkipConnection, MLP.

TPU-native counterparts of the Flux layers the reference builds its default
architectures from (reference: src/models/GOKU.jl:199-274,
src/models/LatentODE.jl:100-152). Convention: activations ride inside the
layer so XLA fuses them into the matmul epilogue; data is row-major
``(..., features)`` so the feature dim lands on the TPU lane dimension.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core import module, static_field
from .init import Initializer, default_init


def identity(x):
    return x


relu = jax.nn.relu
softplus = jax.nn.softplus
sigmoid = jax.nn.sigmoid
tanh = jnp.tanh


@module
class Dense:
    """``y = activation(x @ W + b)``.

    Equivalent of Flux ``Dense(in, out, act; init)`` (used throughout
    reference: src/models/GOKU.jl:214-258). Weight shape is (in, out) so the
    batched input ``(..., in)`` contracts on the MXU without transposes.
    """

    W: jax.Array
    b: jax.Array
    activation: Callable = static_field(default=identity)

    @staticmethod
    def init(key, in_dim: int, out_dim: int, activation: Callable = identity,
             *, winit: Initializer = default_init, dtype=jnp.float32) -> "Dense":
        W = winit(key, (in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype)
        return Dense(W=W, b=b, activation=activation)

    @property
    def in_dim(self) -> int:
        return self.W.shape[0]

    @property
    def out_dim(self) -> int:
        return self.W.shape[1]

    def __call__(self, x):
        # compute in the parameter dtype (bf16 params => bf16 MXU matmul)
        return self.activation(x.astype(self.W.dtype) @ self.W + self.b)


@module
class Chain:
    """Sequential composition (Flux ``Chain``, reference: GOKU.jl:219)."""

    layers: Tuple

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x

    def __getitem__(self, i):
        return self.layers[i]

    def __len__(self):
        return len(self.layers)


@module
class SkipConnection:
    """``y = combine(layer(x), x)`` (Flux ``SkipConnection(l, +)``,
    reference: GOKU.jl:220-221)."""

    layer: Callable
    combine: Callable = static_field(default=jnp.add)

    def __call__(self, x):
        return self.combine(self.layer(x), x)


def mlp(key, dims, activation: Callable = relu, out_activation: Callable = identity,
        *, winit: Initializer = default_init, dtype=jnp.float32) -> Chain:
    """Plain MLP: Dense stack with `activation` on hidden layers.

    Used for e.g. the GOKU latent_out heads (reference: GOKU.jl:252-258) and
    the NODE vector field (reference: examples/pendulum_friction-less/nODE.jl:18-20).
    """
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        act = out_activation if i == len(dims) - 2 else activation
        layers.append(Dense.init(keys[i], din, dout, act, winit=winit, dtype=dtype))
    return Chain(layers=tuple(layers))


def resnet_mlp(key, in_dim: int, hidden_dim: int, out_dim: int,
               activation: Callable = relu, out_activation: Callable = identity,
               *, winit: Initializer = default_init, dtype=jnp.float32) -> Chain:
    """The reference's "resnet" block: Dense -> 2x (Dense + skip) -> Dense.

    Mirrors the feature extractor / reconstructor architecture
    (reference: src/models/GOKU.jl:214-221, 262-269).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return Chain(layers=(
        Dense.init(k1, in_dim, hidden_dim, activation, winit=winit, dtype=dtype),
        SkipConnection(Dense.init(k2, hidden_dim, hidden_dim, activation, winit=winit, dtype=dtype)),
        SkipConnection(Dense.init(k3, hidden_dim, hidden_dim, activation, winit=winit, dtype=dtype)),
        Dense.init(k4, hidden_dim, out_dim, out_activation, winit=winit, dtype=dtype),
    ))


@module
class FrozenLinear:
    """``y = activation(x @ W + b) * out_scale + out_shift`` with W, b held
    as STATIC pytree metadata — constants baked into the compiled program,
    invisible to ``jax.grad`` and to the optimizer (an array leaf with
    ``stop_gradient`` would still be eroded by ADAMW's decoupled weight
    decay, which applies to parameters regardless of gradient).

    Use case: a KNOWN observation model as the reconstructor slot of the
    six-slot template — when the map from latent state to observations is
    known (e.g. a calibrated sensor lift), freezing it forces the latent
    chart to align with the true state instead of letting a learned
    reconstructor absorb an arbitrary latent basis (measured on the
    Kuramoto workload: benchmarks/RESULTS.md round-4 known-lift section).
    Swappability of this slot mirrors reference: GOKU.jl:148 + the
    user-provided-layers contract of LatentDiffEqModel.jl:16-22.

    Scalability limit (by design): W and b live in the pytree's STATIC
    metadata, so (a) every distinct constant set compiles a fresh
    program (two models differing only in frozen weights do not share a
    jit cache entry), and (b) the constants are baked into the compiled
    executable, so a wide map (e.g. a 784-pixel reconstructor) bloats
    the program binary rather than HBM. Intended for small known lifts
    (the measured use is 10->64); for a large known map, prefer an
    array-leaf layer with ``stop_gradient`` plus an optimizer mask
    excluding it from ADAMW decay.

    Output dtype: the matmul runs in W's dtype (f32) for accuracy, and
    the result is cast back to ``x.dtype`` so bf16 pipelines keep their
    activation dtype through this slot.
    """

    data: tuple = static_field()          # (W bytes, b bytes, in, out)
    activation: Callable = static_field(default=identity)
    out_scale: float = static_field(default=1.0)
    out_shift: float = static_field(default=0.0)

    @staticmethod
    def from_arrays(W, b, activation: Callable = identity,
                    out_scale: float = 1.0,
                    out_shift: float = 0.0) -> "FrozenLinear":
        import numpy as np
        W = np.asarray(W, np.float32)
        b = np.asarray(b, np.float32)
        if W.ndim != 2 or b.shape != (W.shape[1],):
            raise ValueError(
                f"FrozenLinear.from_arrays: W must be 2-D and b must have "
                f"shape (W.shape[1],); got W {W.shape}, b {b.shape}")
        return FrozenLinear(
            data=(W.tobytes(), b.tobytes(), W.shape[0], W.shape[1]),
            activation=activation, out_scale=float(out_scale),
            out_shift=float(out_shift))

    def _constants(self):
        import numpy as np
        wb, bb, din, dout = self.data
        W = jnp.asarray(np.frombuffer(wb, np.float32).reshape(din, dout))
        b = jnp.asarray(np.frombuffer(bb, np.float32))
        return W, b

    def __call__(self, x):
        W, b = self._constants()   # trace-time constants under jit
        y = self.activation(x.astype(W.dtype) @ W + b)
        return (y * self.out_scale + self.out_shift).astype(x.dtype)
