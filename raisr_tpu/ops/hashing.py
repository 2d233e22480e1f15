"""Gradient structure tensor (GTWG) and hash-bucket quantization.

Per output pixel the reference computes an 11x11 Gaussian-weighted gradient
Gram matrix (computeGTWG_Segment_*, reference: Library/Raisr_AVX512.cpp:69-131)
and quantizes its eigen-structure into one of
Qangle * Qstrength * Qcoherence = 216 buckets
(GetHashValue_AVX512_32f_16Elements, Raisr_AVX512.cpp:175-258).

TPU-native formulation: the three Gram maps (gx^2, gx*gy, gy^2) are depthwise
11x11 convolutions with the Gaussian window — dense, fusable, no per-pixel
loop. Tie semantics of the strength/coherence binning follow the AVX-512
variant (`edge <= value` counting), the parity target of BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

PI = float(np.pi)


def gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Un-divided central differences (gradient = next - prev; the missing /2
    is folded into the Gaussian normalization factor, Raisr_globals.h:208-210).

    gx is the vertical (row-direction) gradient, gy horizontal — matching
    GetGx/GetGy (Raisr_AVX256.cpp:186-194). Border rows/cols are zero; they
    are never read because the hot zone stays loop_margin away from edges.
    """
    gx = jnp.zeros_like(img)
    gx = gx.at[1:-1, :].set(img[2:, :] - img[:-2, :])
    gy = jnp.zeros_like(img)
    gy = gy.at[:, 1:-1].set(img[:, 2:] - img[:, :-2])
    return gx, gy


def structure_tensor(
    gx: jnp.ndarray, gy: jnp.ndarray, weights: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted Gram maps a = sum w*gx^2, b = sum w*gx*gy, d = sum w*gy^2 over
    the centered (patch x patch) window (computeGTWG accumulation,
    Raisr_AVX256.cpp:295-313). SAME zero padding; border values are masked out
    downstream. Uses the exact (non-separable) literal weight table."""
    maps = jnp.stack([gx * gx, gx * gy, gy * gy])[:, None]  # [3,1,H,W]
    kernel = weights[None, None].astype(maps.dtype)  # [1,1,p,p]
    out = lax.conv_general_dilated(
        maps,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # TPU convs default to bf16 operands; the structure tensor feeds the
        # bucket quantization, so keep true f32 here (bf16x3 on the MXU).
        precision=lax.Precision.HIGHEST,
    )
    return out[0, 0], out[1, 0], out[2, 0]


def _shift2d(img: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    h, w = img.shape
    padded = lax.pad(
        img, jnp.float32(0), ((max(di, 0), max(-di, 0), 0), (max(dj, 0), max(-dj, 0), 0))
    )
    return lax.slice(
        padded, (max(-di, 0), max(-dj, 0)), (max(-di, 0) + h, max(-dj, 0) + w)
    )


def structure_tensor_separable(
    gx: jnp.ndarray, gy: jnp.ndarray, k1d, nf: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Separable structure tensor: 2 x patch_size shift-FMAs per map instead
    of a single-channel 2D conv, which XLA lowers disastrously on TPU (no
    MXU mapping for 1-in/1-out channels: the fused pipeline went from 14.8 s
    to real-time on this path alone).

    Uses the sigma=2 kernel from createGaussianKernel (Raisr.cpp:141-185) —
    the source of the reference's 6-digit literal table; results differ from
    the literal-table conv only in the ~6th digit (exact-tie bucket flips).
    """
    m = len(k1d) // 2
    outs = []
    for mp in (gx * gx, gx * gy, gy * gy):
        v = None
        for i, kv in enumerate(k1d):
            t = _shift2d(mp, m - i, 0) * float(kv)
            v = t if v is None else v + t
        out = None
        for j, kv in enumerate(k1d):
            t = _shift2d(v, 0, m - j) * float(kv)
            out = t if out is None else out + t
        outs.append(out * nf)
    return outs[0], outs[1], outs[2]


def atan2_approx(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 used by every reference SIMD path when built without
    SVML (USE_ATAN2_APPROX; reference: Raisr.cpp:770-793)."""
    abs_y = jnp.abs(y) + 1e-10
    neg_x = x < 0.0
    r = jnp.where(neg_x, (x + abs_y) / (abs_y - x), (x - abs_y) / (x + abs_y))
    angle = jnp.where(neg_x, 3.0 * PI / 4.0, PI / 4.0)
    angle = angle + (0.1963 * r * r - 0.9817) * r
    return jnp.where(y < 0.0, -angle, angle)


def hash_buckets(
    a: jnp.ndarray,
    b: jnp.ndarray,
    d: jnp.ndarray,
    qstr: jnp.ndarray,
    qcoh: jnp.ndarray,
    qangle: int,
    qstrength: int,
    qcoherence: int,
) -> jnp.ndarray:
    """(angle, strength, coherence) quantization -> int32 bucket index.

    Mirrors GetHashValue_AVX512_32f_16Elements (Raisr_AVX512.cpp:175-258):
      - eigenvalues of [[a, b], [b, d]]
      - angle = atan2(b, L1 - d) (or atan2(b != 0 ? .. : 1)), + pi if negative
      - strength = L1; coherence = (sqrt L1 - sqrt L2)/(sqrt L1 + sqrt L2 + 1e-17)
      - strength/coherence indices count `edge <= value` (ties round UP,
        unlike the scalar path's searchsorted `value <= edge`)

    The reference's rcp14(rsqrt14(x)) ~11-bit square roots are replaced by
    exact sqrt (deviates only at exact bin-edge ties).
    """
    t = a + d
    det = a * d - b * b
    disc = jnp.maximum(t * t * 0.25 - det, 0.0)
    sqr = jnp.sqrt(disc)
    half_t = t * 0.5
    l1 = half_t + sqr
    l2 = jnp.maximum(half_t - sqr, 0.0)

    x = jnp.where(b != 0.0, l1 - d, 1.0)
    angle = atan2_approx(b, x)
    angle = angle + jnp.where(angle < 0.0, PI, 0.0)

    sqrt_l1 = jnp.sqrt(l1)
    sqrt_l2 = jnp.sqrt(l2)
    coherence = (sqrt_l1 - sqrt_l2) / (sqrt_l1 + sqrt_l2 + 1e-17)
    strength = l1

    angle_idx = jnp.floor(angle * (qangle / PI)).astype(jnp.int32)
    angle_idx = jnp.clip(angle_idx, 0, qangle - 1)

    strength_idx = jnp.zeros_like(angle_idx)
    for edge in range(qstrength - 1):
        strength_idx = strength_idx + (qstr[edge] <= strength).astype(jnp.int32)
    coherence_idx = jnp.zeros_like(angle_idx)
    for edge in range(qcoherence - 1):
        coherence_idx = coherence_idx + (qcoh[edge] <= coherence).astype(jnp.int32)

    return angle_idx * (qstrength * qcoherence) + strength_idx * qcoherence + coherence_idx


def pixel_types(
    h: int, w: int, ratio: int, patch_margin: int, use_pixel_type: bool
) -> jnp.ndarray:
    """Per-pixel phase -> filter variant index (reference: Raisr.cpp:1091-1094:
    pixelType = ((r - margin) % ratio) * ratio + ((c - margin) % ratio))."""
    if not use_pixel_type:
        return jnp.zeros((h, w), dtype=jnp.int32)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) - patch_margin) % ratio
    cols = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) - patch_margin) % ratio
    return rows * ratio + cols
