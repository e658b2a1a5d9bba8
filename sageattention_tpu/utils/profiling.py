"""Profiling utilities — TPU analogue of the reference's bench/utils.py
timing + Kineto harness (`/root/reference/bench/utils.py:7-33,79-137`).

CUDA events + L2 flush become host-synced queued timing (see testing.py);
torch.profiler/Kineto becomes ``jax.profiler`` emitting Perfetto traces.

Note: on tunneled TPU platforms (axon) the trace captures host-side events
only (device streams don't cross the tunnel); on directly-attached TPUs the
XLA device timeline appears in the same trace.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
from typing import Optional

import jax

from .testing import time_fn  # re-export for bench parity


@contextlib.contextmanager
def trace(trace_dir: str = "/tmp/sageattn_trace"):
    """Capture a profiler trace around a block:

        with trace("/tmp/t") as d:
            fn(*args)
        # Perfetto-compatible trace written under d
    """
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def kernel_table(trace_dir: str, top: int = 20):
    """Parse the newest trace.json.gz under ``trace_dir`` into a
    (name, total_us, calls) table — the analogue of bench_kineto's kernel
    table parse (`bench/utils.py:108-137`)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    totals = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            t, c = totals.get(name, (0.0, 0))
            totals[name] = (t + e["dur"], c + 1)
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:top]
    return [(name, round(dur, 1), calls) for name, (dur, calls) in rows]
