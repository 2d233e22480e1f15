"""Pipelined video processing: overlap host I/O with device compute.

The reference overlaps work with a thread pool inside one frame
(Raisr.cpp:1369-1394) and tells users to run N ffmpeg processes for
throughput (docs/performance.md:8). TPU-natively, JAX's async dispatch gives
inter-frame pipelining for free: keep a bounded queue of in-flight device
results and only materialize them to host `depth` frames later.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional

import numpy as np
import jax.numpy as jnp

from raisr_tpu.engine import RaisrEngine, Frame
from raisr_tpu.utils.profiler import Tracer


@dataclass
class _InFlight:
    y: jnp.ndarray
    u: Optional[jnp.ndarray]
    v: Optional[jnp.ndarray]


class StreamProcessor:
    """Process an iterator of Frames with `depth` frames in flight."""

    def __init__(self, engine: RaisrEngine, depth: int = 2, tracer: Optional[Tracer] = None):
        self.engine = engine
        self.depth = max(1, depth)
        self.tracer = tracer or Tracer(enabled=False)

    def _materialize(self, inflight: _InFlight) -> Frame:
        dt = np.uint8 if self.engine.cfg.bits == 8 else np.uint16
        return Frame(
            y=np.asarray(inflight.y).astype(dt),
            u=np.asarray(inflight.u).astype(dt) if inflight.u is not None else None,
            v=np.asarray(inflight.v).astype(dt) if inflight.v is not None else None,
        )

    def process(self, frames: Iterable[Frame]) -> Iterator[Frame]:
        queue: collections.deque[_InFlight] = collections.deque()
        eng = self.engine
        for frame in frames:
            with self.tracer.stage("dispatch"):
                y = eng.upscale_y(jnp.asarray(frame.y))
                u = eng.upscale_uv(jnp.asarray(frame.u)) if frame.u is not None else None
                v = eng.upscale_uv(jnp.asarray(frame.v)) if frame.v is not None else None
                queue.append(_InFlight(y, u, v))
            while len(queue) > self.depth:
                with self.tracer.stage("materialize"):
                    out = self._materialize(queue.popleft())
                self.tracer.count_frame()
                yield out
        while queue:
            with self.tracer.stage("materialize"):
                out = self._materialize(queue.popleft())
            self.tracer.count_frame()
            yield out
