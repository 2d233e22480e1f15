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
    """Process an iterator of Frames with `depth` dispatches in flight.

    batch > 1 enables the device-resident batched engine path: groups of
    `batch` frames ride ONE kernel dispatch as a guard-banded stack
    (engine.process_batch_y) — per-frame outputs are exactly the
    single-frame results, at batched throughput. This replaces the
    reference's N-parallel-ffmpeg-processes recipe (docs/performance.md:8)."""

    def __init__(self, engine: RaisrEngine, depth: int = 2, batch: int = 1,
                 tracer: Optional[Tracer] = None):
        self.engine = engine
        self.depth = max(1, depth)
        self.batch = max(1, batch)
        self.tracer = tracer or Tracer(enabled=False)

    def _materialize(self, inflight: _InFlight) -> Frame:
        dt = np.uint8 if self.engine.cfg.bits == 8 else np.uint16
        return Frame(
            y=np.asarray(inflight.y).astype(dt),
            u=np.asarray(inflight.u).astype(dt) if inflight.u is not None else None,
            v=np.asarray(inflight.v).astype(dt) if inflight.v is not None else None,
        )

    def process(self, frames: Iterable[Frame]) -> Iterator[Frame]:
        if self.batch > 1:
            yield from self._process_batched(frames)
            return
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

    def _dispatch_group(self, group: list[Frame]) -> tuple[_InFlight, int]:
        """One batched dispatch; short tail groups are padded by repeating
        the last frame (keeps the jit shape) and sliced on materialize."""
        eng = self.engine
        n_real = len(group)
        while len(group) < self.batch:
            group = group + [group[-1]]
        ys = jnp.stack([jnp.asarray(f.y) for f in group])
        y = eng.process_batch_y(ys)
        u = v = None
        if group[0].u is not None:
            u = eng.process_batch_uv(jnp.stack([jnp.asarray(f.u) for f in group]))
        if group[0].v is not None:
            v = eng.process_batch_uv(jnp.stack([jnp.asarray(f.v) for f in group]))
        return _InFlight(y, u, v), n_real

    def _process_batched(self, frames: Iterable[Frame]) -> Iterator[Frame]:
        queue: collections.deque[tuple[_InFlight, int]] = collections.deque()
        dt = np.uint8 if self.engine.cfg.bits == 8 else np.uint16

        def materialize(inflight: _InFlight, n_real: int) -> Iterator[Frame]:
            ys = np.asarray(inflight.y).astype(dt)
            us = np.asarray(inflight.u).astype(dt) if inflight.u is not None else None
            vs = np.asarray(inflight.v).astype(dt) if inflight.v is not None else None
            for i in range(n_real):
                self.tracer.count_frame()
                yield Frame(
                    y=ys[i],
                    u=us[i] if us is not None else None,
                    v=vs[i] if vs is not None else None,
                )

        group: list[Frame] = []
        for frame in frames:
            group.append(frame)
            if len(group) == self.batch:
                with self.tracer.stage("dispatch"):
                    queue.append(self._dispatch_group(group))
                group = []
                while len(queue) > self.depth:
                    with self.tracer.stage("materialize"):
                        yield from materialize(*queue.popleft())
        if group:
            with self.tracer.stage("dispatch"):
                queue.append(self._dispatch_group(group))
        while queue:
            with self.tracer.stage("materialize"):
                yield from materialize(*queue.popleft())
