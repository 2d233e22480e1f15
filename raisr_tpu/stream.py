"""Pipelined video processing: overlap host I/O with device compute.

The reference overlaps work with a thread pool inside one frame
(Raisr.cpp:1369-1394) and tells users to run N ffmpeg processes for
throughput (docs/performance.md:8). TPU-natively, JAX's async dispatch gives
inter-frame pipelining for free: keep a bounded queue of in-flight device
results and only materialize them to host `depth` frames later.

Dispatches ride the engine's one-jit device-resident step
(`process_batch_device`: integer planes in, integer planes out, Y + UV in
one compiled computation) so each frame costs ONE kernel dispatch and the
host read-back moves the packed integer planes (8-bit: 4x less traffic
than materializing the f32 pipeline output — measured 3.4x end-to-end on
the round-5 hardware tunnel). Sharded engines (shard=) fall back to the
per-plane entry points with an on-device integer cast before read-back.
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
    # True when planes are [N, H, W] stacks from process_batch_device and
    # n_real frames must be sliced out on materialize.
    stacked: bool = False
    n_real: int = 1


class StreamProcessor:
    """Process an iterator of Frames with `depth` dispatches in flight.

    batch > 1 groups `batch` frames into ONE device-step dispatch (the Y
    stack rides the guard-banded batched kernel) — per-frame outputs are
    exactly the single-frame results, at batched throughput. This replaces
    the reference's N-parallel-ffmpeg-processes recipe
    (docs/performance.md:8)."""

    def __init__(self, engine: RaisrEngine, depth: int = 2, batch: int = 1,
                 tracer: Optional[Tracer] = None):
        self.engine = engine
        self.depth = max(1, depth)
        self.batch = max(1, batch)
        self.tracer = tracer or Tracer(enabled=False)

    @property
    def _np_dtype(self):
        return np.uint8 if self.engine.cfg.bits == 8 else np.uint16

    @property
    def _jnp_dtype(self):
        return jnp.uint8 if self.engine.cfg.bits == 8 else jnp.uint16

    def _materialize(self, inflight: _InFlight) -> Iterator[Frame]:
        dt = self._np_dtype
        ys = np.asarray(inflight.y).astype(dt)
        us = np.asarray(inflight.u).astype(dt) if inflight.u is not None else None
        vs = np.asarray(inflight.v).astype(dt) if inflight.v is not None else None
        if not inflight.stacked:
            self.tracer.count_frame()
            yield Frame(y=ys, u=us, v=vs)
            return
        for i in range(inflight.n_real):
            self.tracer.count_frame()
            yield Frame(
                y=ys[i],
                u=us[i] if us is not None else None,
                v=vs[i] if vs is not None else None,
            )

    def _dispatch_stack(self, group: list[Frame], pad_to: int) -> _InFlight:
        """One device-step dispatch over a stack of frames; short tail
        groups are padded by repeating the last frame (keeps the jit
        shape) and sliced on materialize."""
        eng = self.engine
        n_real = len(group)
        while len(group) < pad_to:
            group = group + [group[-1]]
        ys = jnp.stack([jnp.asarray(f.y) for f in group])
        us = vs = None
        if group[0].u is not None:
            us = jnp.stack([jnp.asarray(f.u) for f in group])
        if group[0].v is not None:
            vs = jnp.stack([jnp.asarray(f.v) for f in group])
        if eng._mesh is None:
            y, u, v = eng.process_batch_device(ys, us, vs)
        else:
            # sharded batches go through the shard_map entry points
            # directly (their scoped-VMEM jit is the compile root and
            # can't nest inside the device step's jit); cast on device
            # so read-back still moves packed integers.
            dt = self._jnp_dtype
            y = eng.process_batch_y(ys.astype(jnp.float32)).astype(dt)
            u = (eng.process_batch_uv(us.astype(jnp.float32)).astype(dt)
                 if us is not None else None)
            v = (eng.process_batch_uv(vs.astype(jnp.float32)).astype(dt)
                 if vs is not None else None)
        return _InFlight(y, u, v, stacked=True, n_real=n_real)

    def _dispatch_sharded(self, frame: Frame) -> _InFlight:
        """Per-plane path for sharded engines (row stripes need the
        single-frame shard_map entry point). Planes are cast to the
        output integer dtype ON DEVICE so read-back moves packed
        integers, not the f32 pipeline output."""
        eng = self.engine
        dt = self._jnp_dtype
        y = eng.upscale_y(jnp.asarray(frame.y)).astype(dt)
        u = (eng.upscale_uv(jnp.asarray(frame.u)).astype(dt)
             if frame.u is not None else None)
        v = (eng.upscale_uv(jnp.asarray(frame.v)).astype(dt)
             if frame.v is not None else None)
        return _InFlight(y, u, v)

    def process(self, frames: Iterable[Frame]) -> Iterator[Frame]:
        queue: collections.deque[_InFlight] = collections.deque()
        sharded = self.engine._mesh is not None
        group: list[Frame] = []
        for frame in frames:
            if sharded and self.batch == 1:
                with self.tracer.stage("dispatch"):
                    queue.append(self._dispatch_sharded(frame))
            else:
                group.append(frame)
                if len(group) < self.batch:
                    continue
                with self.tracer.stage("dispatch"):
                    queue.append(self._dispatch_stack(group, self.batch))
                group = []
            while len(queue) > self.depth:
                with self.tracer.stage("materialize"):
                    yield from self._materialize(queue.popleft())
        if group:
            with self.tracer.stage("dispatch"):
                queue.append(self._dispatch_stack(group, self.batch))
        while queue:
            with self.tracer.stage("materialize"):
                yield from self._materialize(queue.popleft())
