"""Stage timing and profiling.

Equivalent of the reference's wall-clock instrumentation (vul_timer
PROGRESS_OUTPUT/TIMER_OUTPUT macros, itk::TimeProbe around every extraction
stage — SURVEY §5), plus hooks into the JAX profiler for XPlane traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class StageTimers:
    """Accumulating named timers; device-sync-aware."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    def _sync(self):
        if self.sync:
            try:
                import jax

                (jax.device_put(0.0) + 0).block_until_ready()
            except Exception:
                pass

    @contextlib.contextmanager
    def time(self, name: str):
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:32s} {self.totals[name]:9.3f}s  x{self.counts[name]}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k]}
            for k in self.totals
        }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """JAX profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
