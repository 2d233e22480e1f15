"""raisr_tpu — TPU-native video super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of Intel's "Enhanced RAISR" video
super-resolution library (reference: OpenVisualCloud/Video-Super-Resolution-Library).
The reference's AVX2/AVX-512/AVX512FP16/OpenCL inner loops become fused TPU
kernels; its thread-pool row-segment parallelism becomes XLA sharding over a
device mesh; its global mutable state becomes an immutable config + filter-bank
pytree and a functional `process_frame`.

Public API (mirrors the reference's 5-function C API, Library/Raisr.h:14-33):
    RaisrConfig        — all knobs of the vf_raisr FFmpeg filter
    load_model         — filterbin/Qfactor/config parser (== RNLInit model load)
    RaisrEngine        — init once, process frames (== RNLInit/SetRes/Process)
"""

from raisr_tpu.config import (
    RaisrConfig,
    BlendingMode,
    RangeType,
    RaisrError,
)
from raisr_tpu.model.loader import load_model, FilterBank, RaisrModel
from raisr_tpu.engine import RaisrEngine

__version__ = "1.0.0"

__all__ = [
    "RaisrConfig",
    "BlendingMode",
    "RangeType",
    "RaisrError",
    "load_model",
    "FilterBank",
    "RaisrModel",
    "RaisrEngine",
]
