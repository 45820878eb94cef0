"""Profiling and observability helpers.

The reference's observability is per-iteration verbose prints (SURVEY.md
§5). The TPU-native equivalents here: XLA trace annotations around solver
regions (visible in xprof/tensorboard), a solver timing harness for the
iterations/s metric, and NaN-checking guidance.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region for the JAX profiler (shows up in xprof)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full device trace into ``log_dir`` (view in tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_solver(fn, *args, warmup=1, repeats=3, **kwargs):
    """Measure best-of-N wall time of a jitted solver call.

    Returns ``(seconds, result)``; use with a fixed iteration count
    (``tol=0``) to derive iterations/s.
    """
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best, result


@contextlib.contextmanager
def debug_nans(enable=True):
    """Enable jax_debug_nans within a scope (the functional analogue of the
    reference's NaN-abort checks, for debugging rather than recovery —
    solvers already carry in-graph NaN exits)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
