"""Shared jax.profiler trace helpers for the hardware tools.

Wall clock through the TPU tunnel jitters by tens of milliseconds, so
every tool measures DEVICE time: run under a profiler trace and sum the
TPU-side durations of the jitted computations. This helper is the single
home of that trace-parsing heuristic (pid whose process_name contains
"TPU", events named ``jit_*``) — it used to be copy-pasted per tool.
"""
from __future__ import annotations

import glob
import gzip
import json
import tempfile


def device_us(run_fn, prefix: str = "trace_") -> float:
    """Total device-side microseconds of all jitted computations executed
    by ``run_fn()`` (profiler events, immune to tunnel latency)."""
    import jax

    trace_dir = tempfile.mkdtemp(prefix=prefix)
    jax.profiler.start_trace(trace_dir)
    run_fn()
    jax.profiler.stop_trace()
    tf = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                          recursive=True))[-1]
    data = json.load(gzip.open(tf))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    return sum(e.get("dur", 0) for e in events
               if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
               and e.get("name", "").startswith("jit_"))


def device_ms(run_fn, prefix: str = "trace_") -> float:
    return device_us(run_fn, prefix) / 1e3
