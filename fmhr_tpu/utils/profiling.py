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


def top_device_ops(trace_dir: str, n_iters: int = 1, top: int = 30):
    """Parse a perfetto trace dir into [(name, ms_per_iter, count)], the
    top device ops by total duration (the parsing used by
    scripts/trace_step.py, shared so bench --trace can attribute the
    production step)."""
    import collections
    import glob
    import gzip
    import json

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None, 0.0
    with gzip.open(files[0], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        agg[name] += dur
        cnt[name] += 1
        total += dur
    rows = [(name, dur / n_iters, cnt[name] // max(n_iters, 1))
            for name, dur in agg.most_common(top)]
    return rows, total / max(n_iters, 1)


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
