"""Profiling / tracing utilities.

The tracing subsystem the reference lacks entirely (SURVEY.md §5: printf
only). Wraps jax.profiler for device traces and provides a trace-summary
parser so hotspots can be inspected without TensorBoard — used for the
speed-of-light kernel analysis the north star requires.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple

import jax


@contextmanager
def device_trace(outdir: str):
    """Context manager: capture a device trace for the enclosed block."""
    with jax.profiler.trace(outdir):
        yield


def summarize_trace(outdir: str, top: int = 30) -> List[Tuple[str, float, int]]:
    """Parse trace_viewer json.gz files under outdir.

    Returns [(op_name, total_ms, count)] sorted by total time descending.
    """
    totals: Dict[str, List[float]] = {}
    for fp in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                        recursive=True):
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                rec = totals.setdefault(name, [0.0, 0])
                rec[0] += ev["dur"]
                rec[1] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:top]
    return [(name, dur / 1000.0, int(cnt)) for name, (dur, cnt) in rows]


def print_trace_summary(outdir: str, top: int = 30) -> None:
    for name, ms, cnt in summarize_trace(outdir, top):
        print(f"{ms:10.2f} ms  x{cnt:5d}  {name[:110]}")


class StageTimer:
    """Lightweight wall-clock stage timing with block_until_ready fencing.

    For coarse per-stage numbers without a device trace (device work is
    async; fencing makes wall times attributable)."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextmanager
    def stage(self, name: str, result=None):
        import time
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items()}
