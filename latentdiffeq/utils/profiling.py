"""Observability: phase timers, profiler hooks, NaN debugging.

The reference has no tracing or profiling (SURVEY.md §5: only a
ProgressMeter). Here: lightweight wall-clock phase timers, a context
manager around `jax.profiler` for real TPU traces, and a NaN debug switch
(the JAX analogue of the reference's ``CUDA.allowscalar(false)`` guard +
its NaN-fill failure convention, model_train.jl:21, GOKU.jl:113-114).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

__all__ = ["PhaseTimer", "trace_profile", "enable_debug_nans"]


class PhaseTimer:
    """Accumulating per-phase wall-clock timer.

    >>> timer = PhaseTimer()
    >>> with timer("solve"):
    ...     sol = solve(...)
    >>> timer.summary()
    {'solve': {'total_s': ..., 'count': ..., 'mean_ms': ...}}

    Note: JAX dispatch is async — wrap the region's result in
    `jax.block_until_ready` (or pass ``block=True`` arrays) for honest
    device timings.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] /
                                 max(self.counts[k], 1), 3)}
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_profile(logdir: str):
    """Capture a `jax.profiler` device trace for the enclosed region
    (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(on: bool = True):
    """Debug mode: raise on NaN production inside jitted code instead of
    letting the NaN-fill convention flow into the loss (SURVEY.md §5)."""
    jax.config.update("jax_debug_nans", on)
