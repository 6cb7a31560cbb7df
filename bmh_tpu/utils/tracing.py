"""Profiling / tracing hooks — absent in the reference (SURVEY §5).

Thin wrappers over jax.profiler so any pipeline section can be captured for
xprof/TensorBoard, plus named wall-clock annotations that work everywhere.
Enable a trace with BMH_TRACE_DIR=/path or the context manager.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


@contextmanager
def device_trace(out_dir: str | None = None):
    """Capture an xprof trace of the enclosed block (no-op without a dir)."""
    import jax

    d = out_dir or os.environ.get("BMH_TRACE_DIR")
    if not d:
        yield
        return
    jax.profiler.start_trace(d)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region visible in xprof traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulates wall-clock per named stage; cheap enough to leave on."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{k}: {v:.3f}s over {self.counts[k]} calls"
                 for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
