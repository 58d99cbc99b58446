"""Profiling helpers (reference analog: flamegraph + criterion practice,
reference: paper/eval/flamegraph.svg, benches/sasa_benchmarks.rs).

Wraps jax.profiler for device traces plus a tiny wall-clock section timer
for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (viewable with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer for named pipeline phases."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(
                f"{name:24s} {self.totals[name]:8.3f}s "
                f"({self.counts[name]} calls)"
            )
        return "\n".join(lines)
