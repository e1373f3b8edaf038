"""Wall-clock accumulation helpers (reference: src/TimeIt.jl).

The Julia `@timeit counter expr` macro becomes a context manager that adds
elapsed seconds to a named counter, plus an optional jax.profiler trace
wrapper for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_counters = defaultdict(float)


@contextlib.contextmanager
def timeit(counter: str):
    """with timeit("smc_step"): ...  — accumulates into a global counter."""
    t0 = time.time()
    try:
        yield
    finally:
        _counters[counter] += time.time() - t0


def elapsed(counter: str) -> float:
    return _counters[counter]


def reset(counter: str = None):
    if counter is None:
        _counters.clear()
    else:
        _counters.pop(counter, None)


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
