"""Tracing and profiling utilities (SURVEY.md §5: the reference ships only
vestigial trace hooks and fps prints; the rebuild's equivalents are the JAX
profiler plus per-stage wall timers)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/h264bsd_tpu_trace"):
    """Capture an XLA/xplane trace of everything inside the context;
    view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimers:
    """Lightweight accumulating wall timers for host-side pipeline stages
    (parse / pack / transfer / dispatch ...)."""

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

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = max(self.counts[name], 1)
            lines.append(f"{name}: {self.totals[name] * 1e3:.2f} ms total, "
                         f"{self.totals[name] / n * 1e3:.3f} ms avg x{n}")
        return "\n".join(lines)
