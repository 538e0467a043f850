"""Profiling/observability: wall-clock stage timers + jax profiler
hooks.

The TPU-native replacement of the reference's getDoubleTime()
checkpoints (t0..t6 in fuser_hmt.cpp:189-488) and callgrind hooks
(publish_graph_message.cpp:1264): stage timers that block on device
results, a scans/s tracker, and a context manager around
jax.profiler.trace for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimers:
    """Accumulating named wall-clock timers (device-blocking)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                # Force by VALUE READBACK: jax.block_until_ready is a
                # NO-OP through the TPU tunnel relay (returns before
                # execution — CLAUDE.md measurement protocol).  A sum
                # readback of every leaf is the cheapest host-visible
                # consumption that depends on all output buffers.
                import jax.numpy as jnp

                for leaf in jax.tree.leaves(block_on):
                    float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mean_ms(self, name):
        c = self.counts[name]
        return 1e3 * self.totals[name] / c if c else 0.0

    def report(self):
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name:30s} {self.mean_ms(name):9.3f} ms avg "
                f"x{self.counts[name]}"
            )
        return "\n".join(lines)


class ThroughputMeter:
    """scans/s tracker (the BASELINE.md metric)."""

    def __init__(self):
        self.n = 0
        self.t0 = time.perf_counter()

    def tick(self, k=1):
        self.n += k

    @property
    def per_sec(self):
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else 0.0


@contextlib.contextmanager
def device_trace(logdir):
    """jax profiler trace around a region (view with tensorboard /
    xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
