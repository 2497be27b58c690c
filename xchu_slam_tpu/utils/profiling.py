"""Tracing / profiling.

Replaces the reference's ad-hoc wall-clock instrumentation (`TicToc`,
`scancontext/tic_toc.h:11-68`; per-scan `ros::Time` deltas,
`odom_node.cpp:210-217,285-286`) with named stage meters plus a
`jax.profiler` trace hook for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimers:
    """Named accumulating wall-clock meters (TicToc analogue)."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self.last = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            self.last[name] = dt

    def mean_ms(self, name: str) -> float:
        c = self.count[name]
        return 1000.0 * self.total[name] / c if c else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.total):
            lines.append(
                f"{name:24s} n={self.count[name]:6d} "
                f"mean={self.mean_ms(name):8.2f} ms "
                f"total={self.total[name]:8.2f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope — inspect with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_on(tree):
    """Synchronize on every array in a pytree (for honest stage timings)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
