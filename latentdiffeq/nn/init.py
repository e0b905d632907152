"""Weight initializers.

The reference's default initializer is Flux's ``kaiming_uniform(gain=1/sqrt(3))``
(reference: src/models/GOKU.jl:204, src/models/LatentODE.jl:103). Flux draws
from U(-bound, bound) with ``bound = sqrt(3) * gain / sqrt(fan_in)``.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, tuple, jnp.dtype], jax.Array]


def kaiming_uniform(gain: float = math.sqrt(2.0)) -> Initializer:
    """Kaiming/He uniform init, Flux semantics.

    For a weight of shape ``(fan_in, fan_out)`` (our Dense convention,
    ``y = x @ W + b``), samples U(-b, b) with ``b = sqrt(3) * gain / sqrt(fan_in)``.
    With the reference's gain = 1/sqrt(3) this reduces to b = 1/sqrt(fan_in).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) >= 1 else 1
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def glorot_uniform() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) >= 1 else 1
        fan_out = shape[-1] if len(shape) >= 2 else 1
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def zeros_init() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    return init


# The reference's default everywhere (GOKU.jl:204).
default_init = kaiming_uniform(gain=1.0 / math.sqrt(3.0))
