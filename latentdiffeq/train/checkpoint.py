"""Checkpointing: save/restore full training state.

The reference only saves best-validation weights via BSON
(model_train.jl:212-217) and has no resume path (SURVEY.md §5). Here the
full ``(model, opt_state, epoch, rng, extras)`` pytree round-trips through a
single .npz file. Loading requires a template pytree with the same structure
(the normal JAX pattern — structure is code, arrays are data).

Format v2 (current): every leaf is stored under its pytree *key path*
(``jax.tree_util.tree_flatten_with_path``) plus a format-version field, so
a dataclass field rename/addition fails with a message naming the exact
divergent paths — and a reordered-but-identical structure still loads.
Format v1 (legacy): leaves by flattening order (``leaf_{i}``); still
loadable through the order-based shim below.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "FORMAT_VERSION"]

FORMAT_VERSION = 2
_LEAF_PREFIX = "leaf::"


def _path_str(path) -> str:
    """Render a jax key path as a stable '/'-joined string."""
    parts = []
    for e in path:
        if isinstance(e, jax.tree_util.GetAttrKey):
            parts.append(e.name)
        elif isinstance(e, jax.tree_util.DictKey):
            parts.append(str(e.key))
        elif isinstance(e, jax.tree_util.SequenceKey):
            parts.append(str(e.idx))
        elif isinstance(e, jax.tree_util.FlattenedIndexKey):
            parts.append(str(e.key))
        else:  # unknown key type: fall back to its repr
            parts.append(str(e))
    return "/".join(parts) if parts else "<root>"


def _paths_and_leaves(tree):
    """(unique path string, leaf) pairs in flatten order. Path strings are
    unique by pytree construction; a pathological collision (e.g. dict keys
    containing '/') gets a disambiguating ordinal suffix deterministically
    in flatten order, identically at save and load time."""
    pairs = jax.tree_util.tree_flatten_with_path(tree)[0]
    seen: dict = {}
    out = []
    for p, leaf in pairs:
        name = _path_str(p)
        if name in seen:
            seen[name] += 1
            name = f"{name}#{seen[name]}"
        else:
            seen[name] = 0
        out.append((name, leaf))
    return out


def _leaf_to_numpy(leaf) -> np.ndarray:
    """npz-safe ndarray for a leaf. bfloat16 (an ml_dtypes extension numpy
    cannot round-trip through savez — it reloads as a void dtype) is stored
    as float32, which represents every bf16 exactly; `load_checkpoint`
    casts back to the template's dtype."""
    a = np.asarray(leaf)
    if a.dtype.kind not in "biufc":  # bfloat16 et al. register as void
        a = np.asarray(jnp.asarray(leaf).astype(jnp.float32))
    return a


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None):
    """Save a pytree's leaves (path-keyed, format v2) + optional
    JSON-serializable metadata."""
    named = _paths_and_leaves(tree)
    arrays = {_LEAF_PREFIX + name: _leaf_to_numpy(leaf)
              for name, leaf in named}
    blob = {"format_version": FORMAT_VERSION, "meta": meta or {},
            "paths": [name for name, _ in named]}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(blob).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _load_v1(data, template):
    """Legacy order-based shim: leaves stored as ``leaf_{i}``."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n_stored = len([k for k in data.files if k != "__meta__"])
    if len(leaves) != n_stored:
        raise ValueError(
            f"legacy (v1) checkpoint has {n_stored} leaves, template has "
            f"{len(leaves)} — structures do not match")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != template "
                f"shape {leaf.shape}")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _load_v2(data, template, paths):
    stored = set(paths)
    named = _paths_and_leaves(template)
    want = set(name for name, _ in named)
    if stored != want:
        missing = sorted(want - stored)
        extra = sorted(stored - want)
        msg = ["checkpoint/template structure mismatch:"]
        if missing:
            msg.append(f"  paths in template but not checkpoint: "
                       f"{missing[:8]}{' …' if len(missing) > 8 else ''}")
        if extra:
            msg.append(f"  paths in checkpoint but not template: "
                       f"{extra[:8]}{' …' if len(extra) > 8 else ''}")
        msg.append("  (a renamed/added field invalidates old checkpoints; "
                   "re-save or migrate)")
        raise ValueError("\n".join(msg))
    new_leaves = []
    for name, leaf in named:
        arr = data[_LEAF_PREFIX + name]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"leaf '{name}': checkpoint shape {arr.shape} != template "
                f"shape {tuple(leaf.shape)}")
        out = jnp.asarray(arr)
        if hasattr(leaf, "dtype") and out.dtype != leaf.dtype:
            out = out.astype(leaf.dtype)  # bf16 leaves stored as f32
        new_leaves.append(out)
    treedef = jax.tree_util.tree_flatten(template)[1]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_checkpoint(path: str, template: Any):
    """Restore a pytree saved by `save_checkpoint` into ``template``'s
    structure. Returns ``(tree, meta)``. Reads both the current path-keyed
    format (v2) and legacy order-keyed files (v1)."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path} — expected a .npz written by "
            "save_checkpoint / Trainer.save")
    with np.load(path) as data:
        blob = json.loads(bytes(data["__meta__"]).decode())
        if "format_version" in blob:
            meta = blob.get("meta", {})
            tree = _load_v2(data, template, blob["paths"])
        else:  # v1: the whole blob IS the user meta dict
            meta = blob
            tree = _load_v1(data, template)
    return tree, meta
