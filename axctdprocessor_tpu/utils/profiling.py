"""Lightweight per-stage timing + JAX profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md 5).  Here:

* :class:`StageTimer` — wall-clock stage accounting for the decode
  pipelines (host interlude vs device stages vs IO), used by the archive
  runner and benchmarks;
* :func:`device_trace` — context manager around ``jax.profiler.trace``
  for capturing XLA traces when a trace dir is given (no-op otherwise).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall time per named stage across repeated calls."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

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
            lines.append(
                f"{name:28s} {self.totals[name]*1e3:10.1f} ms"
                f"  x{self.counts[name]}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: round(v, 6) for k, v in self.totals.items()}


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Capture a JAX/XLA profiler trace into `trace_dir` (None = no-op)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
