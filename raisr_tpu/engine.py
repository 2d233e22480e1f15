"""RaisrEngine — the user-facing frame processor.

Replaces the reference's RNLInit / RNLSetRes / RNLProcess / RNLDeinit
lifecycle (reference: Library/Raisr.h:14-33) with an object that loads the
model once and processes frames functionally. There is no SetRes step:
geometry is captured by jit specialization on plane shapes (first frame of a
new size pays one compile, like the reference pays SetRes once,
ffmpeg/vf_raisr.c:286-302).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig, Backend, RaisrError
from raisr_tpu.model.loader import load_model, RaisrModel
from raisr_tpu.ops.pipeline import (
    pass_statics,
    process_plane_y,
    process_plane_y_batch,
    process_plane_uv,
    process_plane_uv_batch,
)


def _resolve_backend(cfg: RaisrConfig) -> str:
    if cfg.backend == Backend.REFERENCE:
        return "taps"
    if cfg.backend == Backend.XLA:
        return "conv"
    if cfg.backend == Backend.PALLAS:
        return "pallas"
    # AUTO: the fused Pallas kernels use TPU-only Mosaic primitives
    # (pltpu.roll, VMEM scratch), so select them only on a TPU backend;
    # exact taps on CPU, the conv formulation on other accelerators.
    backend = jax.default_backend()
    if backend == "tpu":
        return "pallas"
    return "taps" if backend == "cpu" else "conv"


@dataclasses.dataclass
class Frame:
    """One video frame as planes (Y required; U/V optional for gray input).

    Arrays are uint8 (bits=8) or uint16 (bits=10/16), matching the
    VideoDataType buffers of the reference (Library/RaisrDefaults.h:10-16).
    """

    y: np.ndarray
    u: Optional[np.ndarray] = None
    v: Optional[np.ndarray] = None


class RaisrEngine:
    def __init__(self, cfg: RaisrConfig, model: Optional[RaisrModel] = None):
        self.cfg = cfg
        self.model = model if model is not None else load_model(cfg.filterfolder, cfg)
        backend = _resolve_backend(cfg)
        self._backend = backend
        self._statics = pass_statics(cfg, self.model, backend)
        self._np_out_dtype = np.uint8 if cfg.bits == 8 else np.uint16

        self._filters = tuple(jnp.asarray(b.filters) for b in self.model.banks)
        self._qstr = tuple(jnp.asarray(b.qstr) for b in self.model.banks)
        self._qcoh = tuple(jnp.asarray(b.qcoh) for b in self.model.banks)

    # -- single-plane entry points (device arrays in/out, jit-cached) -------

    def upscale_y(self, y: jnp.ndarray) -> jnp.ndarray:
        """Process one luma plane; accepts/returns integer-valued arrays."""
        h, w = y.shape
        out_h, out_w = self.cfg.output_size(h, w)
        return process_plane_y(
            y,
            self._filters,
            self._qstr,
            self._qcoh,
            self._statics,
            self.cfg.passes,
            self.cfg.two_pass_mode,
            out_h,
            out_w,
        )

    def upscale_uv(self, plane: jnp.ndarray) -> jnp.ndarray:
        h, w = plane.shape
        out_h, out_w = self.cfg.output_size(h, w)
        return process_plane_uv(plane, out_h, out_w, self.cfg.bits)

    # -- frame API -----------------------------------------------------------

    def process(self, frame: Frame) -> Frame:
        """Upscale one frame (numpy in / numpy out)."""
        if frame.y is None:
            raise RaisrError("Y plane is required.")
        y = self.upscale_y(jnp.asarray(frame.y))
        u = self.upscale_uv(jnp.asarray(frame.u)) if frame.u is not None else None
        v = self.upscale_uv(jnp.asarray(frame.v)) if frame.v is not None else None
        to_np = lambda a: np.asarray(a).astype(self._np_out_dtype)
        return Frame(
            y=to_np(y),
            u=to_np(u) if u is not None else None,
            v=to_np(v) if v is not None else None,
        )

    def process_batch_y(self, batch_y: jnp.ndarray) -> jnp.ndarray:
        """Batched luma processing ([N, H, W] in, [N, oH, oW] out).

        Device-resident production path: the batch rides ONE kernel dispatch
        as a guard-banded vertical stack with per-frame zone masks — output
        is exactly N x upscale_y (tests/test_stream.py), at stacked-frame
        throughput rather than per-frame dispatch cost."""
        n, h, w = batch_y.shape
        out_h, out_w = self.cfg.output_size(h, w)
        return process_plane_y_batch(
            batch_y,
            self._filters,
            self._qstr,
            self._qcoh,
            self._statics,
            self.cfg.passes,
            self.cfg.two_pass_mode,
            out_h,
            out_w,
        )

    def process_batch_uv(self, batch_uv: jnp.ndarray) -> jnp.ndarray:
        """Batched chroma cheap upscale ([N, H, W] in)."""
        n, h, w = batch_uv.shape
        out_h, out_w = self.cfg.output_size(h, w)
        return process_plane_uv_batch(batch_uv, out_h, out_w, self.cfg.bits)
