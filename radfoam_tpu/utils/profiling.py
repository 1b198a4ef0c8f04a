"""Profiling & diagnostics.

The reference's observability is nvcc -lineinfo + CUDA-event timing +
per-ray intersection counters (SURVEY.md §5.1). The TPU equivalents here:

  * ``profile_trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-viewable trace directory.
  * ``time_jitted`` — wall-clock timing of a jitted callable with proper
    ``block_until_ready`` fencing (the CUDA-event analog).
  * ``intersection_stats`` — the num_intersections diagnostic channel
    (reference pipeline.cu:128-129 + the viewer's Intersections heat map).
"""

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def profile_trace(logdir):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, warmup=1, reps=5, **kwargs):
    """Median wall time of fn(*args) with device fencing; returns seconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def intersection_stats(num_intersections):
    """Summary of the per-ray walk-length diagnostic channel."""
    n = np.asarray(num_intersections).ravel()
    return {
        "mean": float(n.mean()),
        "p50": float(np.percentile(n, 50)),
        "p90": float(np.percentile(n, 90)),
        "p99": float(np.percentile(n, 99)),
        "max": int(n.max()),
    }
