"""Data utilities: normalization, window sampling, batching.

Replaces the reference's Flux ``DataLoader`` + MLDataUtils ``splitobs``
(model_train.jl:115-120) and the ``time_loader``/``rand_time`` window
sampler (src/utils/utils.jl:86-100). Layout is batch-first:
``x``: (samples, time, features).

Two window samplers are provided: a host-side numpy one (mirrors the
reference's training loop structure) and a jit-side one using
`lax.dynamic_slice` so the whole train step — including window selection —
can live in one compiled program.
"""
from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

__all__ = ["normalize_to_unit_segment", "denormalize_unit_segment",
           "rand_time", "time_loader", "sample_window", "splitobs",
           "DataLoader"]


def normalize_to_unit_segment(x):
    """Min-max normalize to [0, 1]; returns (x_norm, min, max)
    (reference: utils.jl:72-78)."""
    lo = x.min()
    hi = x.max()
    return (x - lo) / (hi - lo), lo, hi


def denormalize_unit_segment(x, lo, hi):
    """Inverse of normalize_to_unit_segment (reference: utils.jl:80)."""
    return x * (hi - lo) + lo


def rand_time(rng: np.random.Generator, full_seq_len: int,
              seq_len: int) -> int:
    """Random window start. Julia's ``rand(1:full-seq)`` (utils.jl:96-100)
    0-based: uniform over [0, full_seq_len - seq_len - 1]; 0 when the
    window spans the full sequence."""
    if seq_len >= full_seq_len:
        return 0
    return int(rng.integers(0, full_seq_len - seq_len))


def time_loader(x: np.ndarray, full_seq_len: int, seq_len: int,
                rng: np.random.Generator) -> np.ndarray:
    """ONE random contiguous window shared by the whole batch
    (reference: utils.jl:86-94). ``x``: (batch, time, features)."""
    s = rand_time(rng, full_seq_len, seq_len)
    return x[:, s:s + seq_len, :]


def sample_window(key, x, seq_len: int):
    """jit-side equivalent of ``time_loader``: one shared random window via
    `lax.dynamic_slice` (SURVEY.md §5 long-context strategy)."""
    full = x.shape[1]
    start = jax.random.randint(key, (), 0, max(full - seq_len, 1))
    return jax.lax.dynamic_slice_in_dim(x, start, seq_len, axis=1)


def splitobs(x, at: float = 0.9):
    """Split along the sample axis (reference: model_train.jl:115-117 uses
    MLDataUtils.splitobs 90/10, no shuffle)."""
    n = x.shape[0]
    k = int(n * at)
    return x[:k], x[k:]


class DataLoader:
    """Shuffled, drop-partial minibatcher (Flux ``DataLoader(batchsize=...,
    shuffle=true, partial=false)``, reference: model_train.jl:120)."""

    def __init__(self, data: np.ndarray, batch_size: int,
                 shuffle: bool = True, drop_partial: bool = True,
                 seed: int = 0):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_partial = drop_partial
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = self.data.shape[0]
        return n // self.batch_size if self.drop_partial else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = self.data.shape[0]
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n - n % self.batch_size) if self.drop_partial else n
        for i in range(0, stop, self.batch_size):
            yield self.data[idx[i:i + self.batch_size]]
