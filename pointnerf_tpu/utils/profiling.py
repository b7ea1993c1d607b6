"""Profiling / tracing utilities.

The reference has no structured profiling — wall-clock prints only
(reference: run/train_ft.py:355, visualizer.py:158-167). Here: jax.profiler
trace capture (TensorBoard-compatible) plus a lightweight per-phase timer the
drivers can report through the Visualizer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA/TPU trace to `log_dir` (view with TensorBoard's
    profile plugin). No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; read via summary()."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = [f"{k}: {self.totals[k]:.2f}s/{self.counts[k]}"
                 for k in sorted(self.totals)]
        return "phases[" + ", ".join(parts) + "]"

    def reset(self):
        self.totals.clear()
        self.counts.clear()
