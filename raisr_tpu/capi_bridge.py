"""Python side of the C ABI (include/raisr_tpu.h, native/capi.cpp).

The embedded-CPython shim passes raw buffer addresses + geometry; this
module views them with ctypes/numpy (zero-copy in, one copy out) and drives
a module-level RaisrEngine — the same one-instance-per-process model as the
reference's global state (Raisr_globals.h), but contained here.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

# Honor JAX_PLATFORMS for embedded-interpreter consumers: site
# customizations may register accelerator plugins that ignore the env var,
# so apply it through jax.config before the first backend use.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:  # backend already initialized; keep it
        pass

from raisr_tpu.config import RaisrConfig, BlendingMode, RangeType
from raisr_tpu.engine import RaisrEngine, Frame

_engine: RaisrEngine | None = None
_cfg: RaisrConfig | None = None
# blending is a per-Process argument in the reference (RNLProcess); engines
# for the non-default mode are built once and cached, sharing the loaded
# model — never rebuilt per frame
_engines_by_blend: dict[int, RaisrEngine] = {}


def set_device(index: int) -> int:
    """Pin this process's default device to chip `index` (RTPU_SetDevice —
    the analogue of RNLHandler_SetOpenCLContext's platform/device
    selection, reference Library/RaisrHandler.h:42-46). Explicitly-sharded
    paths (engine shard=) manage placement themselves; this pins the
    single-device path for one-process-per-chip deployments."""
    try:
        import jax

        devices = jax.devices()
        if not 0 <= index < len(devices):
            print(f"[RAISR ERROR] device index {index} out of range "
                  f"(have {len(devices)})")
            return 1
        jax.config.update("jax_default_device", devices[index])
        return 0
    except Exception as e:  # noqa: BLE001 — C boundary: report, don't raise
        print(f"[RAISR ERROR] set_device failed: {e}")
        return 3


def init(model_path: str, ratio: float, bit_depth: int, range_type: int,
         passes: int, two_pass_mode: int, tier: int = 0) -> int:
    """tier: 0 = f32-grade, 1 = bf16 fast tier, 2 = int8-pair fixed-point
    tier (8-bit content only) — the analogue of the reference C ABI's
    asmType parameter (RNLHandler_Init; its ffmpeg filter defaults to
    avx512fp16, the fast tier)."""
    global _engine, _cfg
    try:
        _cfg = RaisrConfig(
            filterfolder=model_path,
            ratio=ratio,
            bits=bit_depth,
            range=RangeType(range_type),
            passes=passes,
            mode=two_pass_mode,
            dtype={0: "float32", 1: "bfloat16", 2: "int8"}.get(
                tier, "float32"
            ),
        )
        _engine = RaisrEngine(_cfg)
        _engines_by_blend.clear()
        _engines_by_blend[int(_cfg.blending)] = _engine
        return 0
    except Exception as e:  # noqa: BLE001
        print(str(e))
        return 1


def _view(addr: int, height: int, width: int, step: int, bits: int) -> np.ndarray:
    itemsize = 1 if bits == 8 else 2
    n_bytes = step * height
    buf = (ctypes.c_uint8 * n_bytes).from_address(addr)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(height, step)
    if itemsize == 1:
        return arr[:, :width]
    return arr.view(np.uint16).reshape(height, step // 2)[:, :width]


def process(
    in_y, in_cb, in_cr, out_y, out_cb, out_cr, blending: int
) -> int:
    """Each plane arg: None or (addr, width, height, step)."""
    if _engine is None:
        print("[RAISR ERROR] RTPU_Process called before RTPU_Init")
        return 1
    try:
        bits = _cfg.bits

        def rd(p):
            if p is None:
                return None
            addr, w, h, step = p
            return _view(addr, h, w, step, bits)

        frame = Frame(y=rd(in_y), u=rd(in_cb), v=rd(in_cr))
        # per-call blending mode, like RNLProcess's argument; engines are
        # cached per mode (jit caches stay warm across frames)
        eng = _engines_by_blend.get(int(blending))
        if eng is None:
            import dataclasses

            eng = RaisrEngine(
                dataclasses.replace(_engine.cfg, blending=BlendingMode(blending)),
                model=_engine.model,
            )
            _engines_by_blend[int(blending)] = eng
        result = eng.process(frame)

        def wr(p, plane):
            if p is None or plane is None:
                return
            addr, w, h, step = p
            dst = _view(addr, h, w, step, bits)
            np.copyto(dst, plane[:h, :w])

        wr(out_y, result.y)
        wr(out_cb, result.u)
        wr(out_cr, result.v)
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"[RAISR ERROR] {e}")
        return 1


def deinit() -> int:
    global _engine, _cfg
    _engine = None
    _cfg = None
    _engines_by_blend.clear()
    return 0
