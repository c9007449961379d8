"""Lightweight tracing/profiling helpers.

The reference has no tracing at all (SURVEY §5: only tqdm bars). dhts wires
the JAX profiler (XLA device traces viewable in TensorBoard/Perfetto) plus a
simple wall-clock section timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace into ``log_dir`` (open with TensorBoard's
    profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer: ``with timer("phase"): ...``."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{k}: {self.totals[k]:.3f}s over {self.counts[k]} calls"
                 for k in sorted(self.totals)]
        return "\n".join(lines)
