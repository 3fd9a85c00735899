"""Profiling helpers.

The reference measures wall clock around jitted calls with
``block_until_ready`` (reference: ``dardel/time_profile/mf.py:83-106``).
``timed`` reproduces that protocol; ``trace`` wraps ``jax.profiler`` so
a run can be inspected in TensorBoard/XProf (the reference has no
profiler integration).
"""
import contextlib
import time
from typing import Callable

import jax


def timed(fn: Callable, *args, reps: int = 3, warmup: bool = True):
    """(best wall time in seconds, last outputs) for a jitted call."""
    if warmup:
        jax.block_until_ready(fn(*args))
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mfs_tpu_trace"):
    """``with trace(dir): ...`` — captures a jax.profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
