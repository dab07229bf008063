"""Tracing / profiling utilities.

The reference's observability is ad-hoc wall-clock prints
(`pointcloud_pipeline.py:688-696`, SURVEY §5). Here: a stage timer with
running averages/ETA, and a jax.profiler trace context for device-level
analysis (XLA ops, HBM, MXU utilization via TensorBoard).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates per-stage wall-clock stats across frames."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "avg_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:30s} {s['total_s']:8.2f}s total  {s['avg_s']*1000:8.1f}ms avg  x{s['count']}")
        return "\n".join(lines)


class ETAReporter:
    """Running average + ETA over a known item count (parity with the
    reference's per-frame ETA prints)."""

    def __init__(self, total: int):
        self.total = total
        self.done = 0
        self.start = time.time()

    def step(self) -> str:
        self.done += 1
        avg = (time.time() - self.start) / self.done
        eta = avg * (self.total - self.done)
        return f"[{self.done}/{self.total}] avg {avg:.1f}s/item, ETA {eta/60:.1f} min"


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
