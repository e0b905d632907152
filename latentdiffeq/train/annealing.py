"""Cyclical KL-annealing schedule.

Reimplements the reference's ``frange_cycle_linear`` (src/utils/utils.jl:53-67,
itself ported from haofuml/cyclical_annealing) with identical semantics,
including Julia's banker's rounding of the cycle offsets and the 1-based
index bound (the final epoch always keeps ``stop``).
"""
from __future__ import annotations

import numpy as np

__all__ = ["frange_cycle_linear"]


def frange_cycle_linear(n_iter: int, start: float = 0.0, stop: float = 1.0,
                        n_cycle: int = 4, ratio: float = 0.5) -> np.ndarray:
    """Schedule of length ``n_iter``: ``n_cycle`` linear ramps from ``start``
    to ``stop`` over the first ``ratio`` of each cycle, flat at ``stop``
    after (reference: utils.jl:53-67)."""
    L = np.full(n_iter, stop, dtype=np.float32)
    period = n_iter / n_cycle
    step = (stop - start) / (period * ratio)

    for c in range(n_cycle):
        v, i = start, 1
        # Julia: while (v <= stop) & (Int(round(i + c*period)) < n_iter),
        # writing L[Int(round(i + c*period))] with 1-based indexing.
        while v <= stop and int(np.round(i + c * period)) < n_iter:
            L[int(np.round(i + c * period)) - 1] = v
            v += step
            i += 1
    return L
