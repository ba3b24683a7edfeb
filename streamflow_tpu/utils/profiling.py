"""Profiling hooks (SURVEY §5.1: the reference has none beyond wall-clock
deltas; here jax.profiler traces and per-phase timers are first-class)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

_PHASE_TOTALS: Dict[str, float] = defaultdict(float)
_PHASE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str, sync=None):
    """Accumulating wall-clock timer; pass sync=array to block on device work."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        _PHASE_TOTALS[name] += dt
        _PHASE_COUNTS[name] += 1


def phase_report() -> Dict[str, Dict[str, float]]:
    return {
        k: {"total_s": _PHASE_TOTALS[k], "count": _PHASE_COUNTS[k],
            "mean_s": _PHASE_TOTALS[k] / max(_PHASE_COUNTS[k], 1)}
        for k in _PHASE_TOTALS
    }


@contextlib.contextmanager
def trace_ctx(log_dir: str):
    """jax.profiler trace wrapper; view with xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
