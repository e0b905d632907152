"""Checkpointing: save/restore full training state.

The reference only saves best-validation weights via BSON
(model_train.jl:212-217) and has no resume path (SURVEY.md §5). Here the
full ``(model, opt_state, epoch, rng, extras)`` pytree round-trips through a
single .npz file: leaves by flattening order plus a JSON metadata blob.
Loading requires a template pytree with the same structure (the normal JAX
pattern — structure is code, arrays are data).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None):
    """Save a pytree's leaves + optional JSON-serializable metadata."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any):
    """Restore a pytree saved by `save_checkpoint` into ``template``'s
    structure. Returns ``(tree, meta)``."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path} — expected a .npz written by "
            "save_checkpoint / Trainer.save")
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != len([k for k in data.files if k != "__meta__"]):
            raise ValueError(
                f"checkpoint has {len(data.files) - 1} leaves, template has "
                f"{len(leaves)} — structures do not match")
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"shape {leaf.shape}")
            new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
