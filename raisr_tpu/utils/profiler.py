"""Tracing / profiling utilities.

The reference's only instrumentation is a compile-time MEASURE_TIME flag
wrapping processSegment with chrono prints (reference: Raisr.cpp:42,898,
1282-1287). Here: structured per-stage timers, a frames/sec meter, and JAX
profiler integration (xprof traces viewable in TensorBoard/Perfetto).

Note on timing: remote-execution backends (e.g. the axon PJRT tunnel) treat
`block_until_ready` as a no-op and may serve repeated identical dispatches
from a cache. `device_fence` forces a real device round-trip by fetching a
reduction to the host; benchmarks must also vary their inputs per iteration.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def device_fence(*arrays) -> None:
    """True barrier: forces completion of everything producing `arrays`."""
    for a in arrays:
        if hasattr(a, "block_until_ready"):
            a.block_until_ready()
    # host fetch defeats async remote queues and result caches
    for a in arrays:
        if isinstance(a, jax.Array):
            float(jnp.sum(a))
            break


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class Tracer:
    """Per-stage wall-clock tracing + frame throughput meter."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: dict[str, StageStats] = defaultdict(StageStats)
        self._frames = 0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        if not self.enabled:
            yield
            return
        start = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                device_fence(fence)
            self.stages[name].add(time.perf_counter() - start)

    def count_frame(self, n: int = 1):
        self._frames += n

    @property
    def fps(self) -> float:
        return self._frames / max(time.perf_counter() - self._t0, 1e-9)

    def reset(self):
        self.stages.clear()
        self._frames = 0
        self._t0 = time.perf_counter()

    def report(self) -> dict:
        return {
            "frames": self._frames,
            "fps": round(self.fps, 3),
            "stages": {
                k: {
                    "count": v.count,
                    "mean_ms": round(v.mean_s * 1e3, 3),
                    "min_ms": round(v.min_s * 1e3, 3),
                    "max_ms": round(v.max_s * 1e3, 3),
                    "total_s": round(v.total_s, 3),
                }
                for k, v in self.stages.items()
            },
        }

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture an XLA profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
