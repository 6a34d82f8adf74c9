"""Timing / profiling utilities.

The reference's only instrumentation is a wall-clock helper
(``polympc::get_time``, utils/helpers.hpp:60-71) that tests wrap around
``solve()`` calls (e.g. tests/control/cstr_control_test.cpp:156-159).  On
TPU, timing a jitted solve needs two extra steps the C++ never did:
dispatch is asynchronous (``block_until_ready`` before reading the clock)
and the first call pays compilation (warm up before measuring).  This
module packages both, plus a ``jax.profiler`` trace context for deep dives
(the TPU-native replacement for the reference's commented-out std::cout
timing, sqp_base.hpp:539-547).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

__all__ = ["get_time", "Timer", "time_fn", "SolveStats", "trace"]


def get_time() -> float:
    """Monotonic wall-clock seconds (helpers.hpp:60-71)."""
    return time.perf_counter()


class Timer:
    """Context manager: ``with Timer() as t: ...; t.elapsed`` seconds.

    Blocks on ``results`` (any pytree of jax arrays) before stopping the
    clock so asynchronous dispatch cannot fake a fast solve.
    """

    def __init__(self):
        self.elapsed = 0.0
        self._results = None

    def block_on(self, results):
        self._results = results
        return results

    def __enter__(self):
        self._t0 = get_time()
        return self

    def __exit__(self, *exc):
        if self._results is not None:
            jax.block_until_ready(self._results)
        self.elapsed = get_time() - self._t0
        return False


@dataclasses.dataclass
class SolveStats:
    """Solve-rate counters for a timed batch of solves."""
    iters: int              # timed repetitions
    batch: int              # instances per repetition
    total_s: float          # wall-clock for all repetitions
    mean_s: float           # per-repetition wall clock
    solves_per_s: float     # batch * iters / total_s

    def __str__(self):
        return (f"{self.solves_per_s:.1f} solves/s "
                f"({self.mean_s * 1e3:.3f} ms per call, batch {self.batch})")


def time_fn(fn, *args, iters: int = 10, warmup: int = 2,
            batch: int = 1) -> SolveStats:
    """Time ``fn(*args)`` with compile warm-up and dispatch blocking."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = get_time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    total = get_time() - t0
    return SolveStats(iters=iters, batch=batch, total_s=total,
                      mean_s=total / iters,
                      solves_per_s=batch * iters / total if total > 0
                      else float("inf"))


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context: view with TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
