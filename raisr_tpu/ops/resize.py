"""Cheap (bilinear) upscale, numerically compatible with IPP ippiResizeLinear.

The reference upsamples each segment with IPP's linear resizer
(`IPPResize(8|16)`, reference: Library/Raisr.cpp:950-957, macro
Raisr_globals.h:63-81) and its OpenCL backend uses a half-pixel-aligned
linear image sampler with edge clamp + round-to-int
(Raisr_OpenCL_kernel.h:230-255). Both use the standard mapping

    src = (dst + 0.5) * (in_size / out_size) - 0.5,  border-replicate,

and produce an *integer* plane (the reference stores the cheap upscale to
8/16-bit before converting to float, Raisr.cpp:985-991) — that rounding is
part of the algorithm and must be kept for output parity.

Implemented separably with trace-time-constant index vectors so XLA lowers
the axis gathers to cheap static ops; no per-pixel dynamic gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (idx0, idx1, frac) for one axis."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    idx0 = np.floor(src).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, in_size - 1)
    frac = (src - idx0).astype(np.float32)
    return idx0, idx1, frac


def _upscale_axis0_2x(img: jnp.ndarray) -> jnp.ndarray:
    """Gather-free 2x upsample along axis 0.

    The half-pixel mapping for 2x gives fixed weights: out[2k] =
    0.25*in[k-1] + 0.75*in[k] (k-1 edge-clamped), out[2k+1] = 0.75*in[k] +
    0.25*in[k+1]. Expressed as slices + interleave so XLA never emits a
    gather (TPU gathers are slow)."""
    n = img.shape[0]
    prev = jnp.concatenate([img[:1], img[:-1]], axis=0)
    nxt = jnp.concatenate([img[1:], img[-1:]], axis=0)
    even = img + (prev - img) * 0.25
    odd = img + (nxt - img) * 0.25
    return jnp.stack([even, odd], axis=1).reshape((2 * n,) + img.shape[1:])


def bilinear_upscale(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of a single plane (float32 in, float32 out, un-rounded)."""
    in_h, in_w = img.shape
    img = img.astype(jnp.float32)

    if out_h == 2 * in_h and out_w == 2 * in_w:
        return _upscale_axis0_2x(_upscale_axis0_2x(img.T).T)

    r0, r1, rf = _axis_weights(in_h, out_h)
    c0, c1, cf = _axis_weights(in_w, out_w)
    # a + (b - a) * f: single-FMA form, keeps codegen (and exact .5 rounding
    # ties) identical between this and the row-sharded stripe resize
    a = jnp.take(img, r0, axis=0)
    rows = a + (jnp.take(img, r1, axis=0) - a) * rf[:, None]
    b = jnp.take(rows, c0, axis=1)
    out = b + (jnp.take(rows, c1, axis=1) - b) * cf[None, :]
    return out


def cheap_upscale(img: jnp.ndarray, out_h: int, out_w: int, bits: int) -> jnp.ndarray:
    """Integer-valued cheap upscale (float32 array holding ints in [0, 2^bits-1])."""
    out = bilinear_upscale(img, out_h, out_w)
    max_full = float((1 << bits) - 1)
    return jnp.clip(jnp.floor(out + 0.5), 0.0, max_full)
