"""Tracing/profiling hooks: per-stage annotations + step timing.

The reference has no profiling at all (SURVEY.md §5.1); this is a new
first-class subsystem. `trace_stage` wraps pipeline stages in
jax.profiler.TraceAnnotation (visible in Perfetto/XProf captures);
`StageTimer` gives poor-man's host-side stage timing with the relay-safe
readback fence used by bench.py; `capture_trace` dumps a profiler trace dir.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax

__all__ = ["trace_stage", "StageTimer", "capture_trace", "fence"]


@contextlib.contextmanager
def trace_stage(name: str):
    """Annotate a code region for the JAX profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def fence(tree) -> None:
    """Force completion of a computation in a way that survives remote-relay
    execution (block_until_ready may return early there): reduce one leaf to a
    scalar and fetch it."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "sum")]
    if leaves:
        float(leaves[0].sum())


class StageTimer:
    """Accumulates wall-clock per named stage; JSON-serializable summary."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            fence(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a JAX profiler trace (open with XProf/TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
