"""Trace-based device timing for the remote-tunnel TPU backend.

Wall-clock timing is NOT trustworthy on this target: serial data-dependent
chains through jitted pallas calls have been observed to report times 70x
below the profiler's device time (the tunnel acks dispatches early), and
micro-bench loops over constant inputs can be elided outright.  The only
ground truth is the xplane trace.  This module runs a callable under
jax.profiler and returns per-op device-time aggregates.

Usage:
    from trace_time import device_time
    ms_per_call, by_op = device_time(lambda: fn(x), iters=3)
"""

import collections
import glob
import gzip
import json
import re
import tempfile

import jax


def _parse_trace(trace_dir: str, iters: int):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise RuntimeError(f"no trace written under {trace_dir}")
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name")
    by_op = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if "TPU" not in str(names.get(e["pid"], "")):
            continue
        n = e["name"]
        if re.fullmatch(r"\d+", n):
            continue
        by_op[re.sub(r"[.\d]+$", "", n)] += e.get("dur", 0)
    # the jit_* umbrella event spans the whole program execution
    jit_total = sum(v for k, v in by_op.items() if k.startswith("jit_"))
    per_op = {k: v / iters / 1e3 for k, v in by_op.items()
              if not k.startswith("jit_")}
    return jit_total / iters / 1e3, per_op


def device_time(fn, iters: int = 3, trace_dir: str = None):
    """Run fn() iters times under the profiler; return (ms_per_call, by_op).

    ms_per_call is the jit umbrella device time per call; by_op maps op-name
    prefixes to device ms per call.  fn must block (or return a value that
    jax.block_until_ready can wait on).
    """
    out = fn()
    if out is not None:
        jax.block_until_ready(out)
    tmp = trace_dir or tempfile.mkdtemp(prefix="trace_time_")
    jax.profiler.start_trace(tmp)
    try:
        for _ in range(iters):
            out = fn()
        if out is not None:
            jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()
    return _parse_trace(tmp, iters)
