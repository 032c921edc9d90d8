"""Profiling and runtime observability.

The reference instruments with a GPIO pin toggled around its hot loop (read
with an oscilloscope, ``src/sample_compute.h:64,97,102``) and optional
per-thread scheduler counters (``pt_cornell_rp2040_v1_3.h:791-795,826-846``).
TPU equivalents:

- :func:`trace` — a ``jax.profiler`` trace context (perfetto/tensorboard),
  the scope-level view the GPIO pin gave
- :class:`StageTimer` — named wall-clock stage accounting with
  ``block_until_ready`` fencing (the sched_stats analogue: counts + total
  time per stage)
- :func:`device_memory_stats` — HBM live-byte accounting
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", host: bool = False):
    """Capture a jax.profiler trace for everything in the with-block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=not host)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulating per-stage wall-clock timer with device fencing.

    >>> t = StageTimer()
    >>> with t.stage("xcorr"):
    ...     out = f(x)           # fenced with block_until_ready on exit
    >>> t.report()
    """

    def __init__(self):
        self.total_s = defaultdict(float)
        self.calls = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "result" in holder:
                jax.block_until_ready(holder["result"])
            self.total_s[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> str:
        lines = ["stage                 calls    total_ms     ms/call"]
        for name in sorted(self.total_s, key=self.total_s.get, reverse=True):
            t, c = self.total_s[name] * 1e3, self.calls[name]
            lines.append(f"{name:20s} {c:6d} {t:11.2f} {t / max(c, 1):11.3f}")
        return "\n".join(lines)

    def reset(self):
        self.total_s.clear()
        self.calls.clear()


def device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM statistics for a device (None when the backend lacks them)."""
    d = device or jax.devices()[0]
    try:
        return d.memory_stats()
    except Exception:
        return None


class ThroughputMeter:
    """Frames/sec accounting for streaming runs (the 'scope on the GPIO pin'
    equivalent for sustained-rate verification)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.frames = 0
        self.events = 0

    def add(self, frames: int = 0, events: int = 0):
        self.frames += frames
        self.events += events

    @property
    def frames_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.frames / dt if dt > 0 else 0.0
