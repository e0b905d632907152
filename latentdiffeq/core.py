"""Pytree module system for latentdiffeq.

The reference framework (gabrevaya/LatentDiffEq.jl) uses Flux's `@functor` to
register model structs as trainable containers (reference:
src/models/LatentDiffEqModel.jl:39,77,115). The TPU-native equivalent is a
frozen dataclass registered as a JAX pytree: array fields are leaves (trained,
traced, sharded), config fields are static metadata (hashable, baked into the
jit cache key).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax

__all__ = ["module", "field", "static_field", "tree_size", "Identity"]


def field(**kwargs):
    return dataclasses.field(**kwargs)


def static_field(**kwargs):
    """A dataclass field treated as static pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def module(cls=None):
    """Decorator: turn a class into a frozen-dataclass JAX pytree.

    Fields declared with ``static_field()`` become pytree metadata; all other
    fields are pytree children. This replaces Flux's ``@functor`` (reference:
    src/models/LatentDiffEqModel.jl:39).
    """

    def wrap(c):
        c = dataclasses.dataclass(c, frozen=True)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    return wrap if cls is None else wrap(cls)


def tree_size(tree: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(
        leaf.size for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "size")
    )


@module
class Identity:
    """The identity layer (reference: `x -> x` at src/models/LatentODE.jl:149)."""

    def __call__(self, x):
        return x
