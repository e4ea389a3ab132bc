"""Tracing / profiling helpers.

The reference's only observability is tqdm rates and wall-clock fps
(SURVEY §5). Here: `trace()` wraps `jax.profiler` for TensorBoard-viewable
device traces, and `time_fn` gives honest steady-state timings with
compile split out (the pattern used throughout the repo's perf work).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable with TensorBoard/XProf.

    with trace('/tmp/fmhr_trace'):
        step(...); jax.block_until_ready(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Returns (compile_plus_first_s, steady_ms_per_iter, last_output)."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t) / iters * 1e3
    return first, steady, out
