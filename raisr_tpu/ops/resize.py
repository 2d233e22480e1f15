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

The reference also compile-selects cubic (B=0, C=0.75) and 3-lobe Lanczos
resizers (USE_BICUBIC/USE_LANCZOS, Raisr_globals.h:63-81); here they are a
runtime knob (RaisrConfig.resize_mode) built on the same half-pixel
mapping and border-replicate semantics.
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


def _axis_weights_exact(in_size: int, out_size: int):
    """Static (idx0, idx1, w, den) for one axis when the ratio makes every
    bilinear weight a rational with a tiny denominator: frac = w/den exactly,
    with w an exact small integer (2x -> den 4, 1.5x -> den 6). None for any
    other ratio (e.g. evenoutput-trimmed widths)."""
    if out_size == 2 * in_size:
        den = 4
    elif 2 * out_size == 3 * in_size:
        den = 6
    else:
        return None
    idx0, idx1, frac = _axis_weights(in_size, out_size)
    w = np.round(frac.astype(np.float64) * den)
    assert np.abs(w / den - frac).max() < 1e-6  # ratio guarantees exactness
    return idx0, idx1, w.astype(np.float32), float(den)


def _bilinear_exact_rounded(
    img: jnp.ndarray, out_h: int, out_w: int, bits: int
) -> jnp.ndarray | None:
    """Round-half-up bilinear upscale computed in exact f32 integer
    arithmetic, available when both axis ratios are 2x or 1.5x.

    Every intermediate is an exact integer (max 65535*36 < 2^24), so the
    result is the mathematically exact rounding — independent of FMA
    contraction or fusion order. This is what makes the whole-plane,
    guard-band-stacked, and row-stripe-sharded cheap upscales bit-identical
    BY CONSTRUCTION rather than by matching codegen (the sharded 1.5x path
    used to flip rare exact-.5 ties by 1 LSB when XLA fused the two paths'
    f32 FMA chains differently)."""
    in_h, in_w = img.shape
    rv = _axis_weights_exact(in_h, out_h)
    cv = _axis_weights_exact(in_w, out_w)
    if rv is None or cv is None:
        return None
    r0, r1, rw, rden = rv
    c0, c1, cw, cden = cv
    img = img.astype(jnp.float32)
    a = jnp.take(img, r0, axis=0)
    rows_s = a * rden + (jnp.take(img, r1, axis=0) - a) * rw[:, None]
    b = jnp.take(rows_s, c0, axis=1)
    out_s = b * cden + (jnp.take(rows_s, c1, axis=1) - b) * cw[None, :]
    den = rden * cden  # <= 36; out_s = den * bilinear value, exact
    val = jnp.floor((out_s + den / 2) / den)
    return jnp.clip(val, 0.0, float((1 << bits) - 1))


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


def _cubic_kernel(x: np.ndarray, c: float = 0.75) -> np.ndarray:
    """Two-parameter cubic with B=0 (Mitchell-Netravali family) — the
    reference's USE_BICUBIC configures IPP with (0, 0.75), "the value
    OpenCV is using" (Raisr.cpp:458-473, Raisr_globals.h:67-70)."""
    ax = np.abs(x)
    inner = (2.0 - c) * ax**3 + (c - 3.0) * ax**2 + 1.0
    outer = c * (-(ax**3) + 5.0 * ax**2 - 8.0 * ax + 4.0)
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _lanczos3_kernel(x: np.ndarray) -> np.ndarray:
    """3-lobe Lanczos — the reference's USE_LANCZOS configures IPP with
    lobes=3 (Raisr.cpp:464,474, Raisr_globals.h:72-75)."""
    x = np.asarray(x, np.float64)
    out = np.sinc(x) * np.sinc(x / 3.0)
    return np.where(np.abs(x) < 3.0, out, 0.0)


_MODES = {"bilinear": None, "cubic": (_cubic_kernel, 2), "lanczos": (_lanczos3_kernel, 3)}


def _axis_taps(in_size: int, out_size: int, mode: str):
    """Static per-axis resample taps: (idx [ntaps, out] border-clipped,
    weights [ntaps, out] normalized) for the half-pixel mapping."""
    kern, support = _MODES[mode]
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    lo = np.floor(src).astype(np.int64) - support + 1
    ntaps = 2 * support
    idx = np.stack([lo + t for t in range(ntaps)])  # [ntaps, out]
    wgt = kern(src[None, :] - idx)
    wgt = wgt / wgt.sum(axis=0, keepdims=True)  # partition of unity
    idx = np.clip(idx, 0, in_size - 1)  # border replicate
    return idx.astype(np.int32), wgt.astype(np.float32)


def resample_upscale(
    img: jnp.ndarray, out_h: int, out_w: int, mode: str
) -> jnp.ndarray:
    """Separable resize of a single plane in the selected mode (float in,
    float out, un-rounded). Taps are trace-time constants; each axis is a
    handful of static takes + FMAs, like the bilinear path."""
    if mode == "bilinear":
        return bilinear_upscale(img, out_h, out_w)
    in_h, in_w = img.shape
    img = img.astype(jnp.float32)
    ridx, rw = _axis_taps(in_h, out_h, mode)
    cidx, cw = _axis_taps(in_w, out_w, mode)
    rows = sum(
        jnp.take(img, jnp.asarray(ridx[t]), axis=0) * rw[t][:, None]
        for t in range(ridx.shape[0])
    )
    return sum(
        jnp.take(rows, jnp.asarray(cidx[t]), axis=1) * cw[t][None, :]
        for t in range(cidx.shape[0])
    )


def cheap_upscale(
    img: jnp.ndarray, out_h: int, out_w: int, bits: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Integer-valued cheap upscale (float32 array holding ints in [0, 2^bits-1])."""
    in_h, in_w = img.shape
    if mode == "bilinear" and not (out_h == 2 * in_h and out_w == 2 * in_w):
        # non-2x bilinear: exact-integer form when the ratio allows (the 2x
        # slice-interleave path below is already exact — weights are
        # quarters — and gather-free, so it stays the 2x fast path)
        exact = _bilinear_exact_rounded(img, out_h, out_w, bits)
        if exact is not None:
            return exact
    out = resample_upscale(img, out_h, out_w, mode)
    max_full = float((1 << bits) - 1)
    return jnp.clip(jnp.floor(out + 0.5), 0.0, max_full)


def cheap_upscale_stacked(
    img: jnp.ndarray,
    n_frames: int,
    in_h: int,
    pad_in: int,
    out_h: int,
    pad_out: int,
    out_w: int,
    bits: int,
) -> jnp.ndarray:
    """Cheap upscale of a guard-banded vertical frame stack whose frame rows
    are bit-identical to cheap_upscale() of each frame alone.

    The vertical index/weight vectors are computed ONCE for a single frame —
    the same float64 arithmetic as the per-frame path — and tiled across the
    stack. Computing them from global stacked row indices instead (what a
    plain whole-stack resize does) can differ in the last ulp at non-2x
    ratios and flip rare round-half-up ties by 1 LSB; tiling makes the
    identity structural. Guard rows replicate the frame's edge mapping —
    their values fill the inter-frame guard band only and never influence
    frame outputs (the RAISR support of every in-zone frame pixel lies
    inside its frame; see ops.pipeline.process_plane_y_batch)."""
    period_in = in_h + 2 * pad_in
    assert img.shape[0] == n_frames * period_in, (img.shape, n_frames, period_in)
    rv = _axis_weights_exact(in_h, out_h)
    cv = _axis_weights_exact(img.shape[1], out_w)
    if rv is not None and cv is not None:
        # exact-integer arithmetic (see _bilinear_exact_rounded): identical
        # to the per-frame path independent of fusion/FMA codegen
        r0, r1, rf, rden = rv
        c0, c1, cf, cden = cv
    else:
        r0, r1, rf = _axis_weights(in_h, out_h)
        c0, c1, cf = _axis_weights(img.shape[1], out_w)
        rden = cden = 1.0
    top = np.full(pad_out, pad_in, np.int32)  # frame row 0
    bot = np.full(pad_out, pad_in + in_h - 1, np.int32)  # frame last row
    zf = np.zeros(pad_out, np.float32)
    p_r0 = np.concatenate([top, r0 + pad_in, bot])
    p_r1 = np.concatenate([top, r1 + pad_in, bot])
    p_rf = np.concatenate([zf, rf, zf])
    offs = (np.arange(n_frames, dtype=np.int32) * period_in)[:, None]
    g_r0 = jnp.asarray((p_r0[None, :] + offs).reshape(-1))
    g_r1 = jnp.asarray((p_r1[None, :] + offs).reshape(-1))
    g_rf = jnp.asarray(np.tile(p_rf, n_frames))

    img = img.astype(jnp.float32)
    a = jnp.take(img, g_r0, axis=0)
    rows = a * rden + (jnp.take(img, g_r1, axis=0) - a) * g_rf[:, None]
    b = jnp.take(rows, c0, axis=1)
    out = b * cden + (jnp.take(rows, c1, axis=1) - b) * cf[None, :]
    den = rden * cden
    max_full = float((1 << bits) - 1)
    return jnp.clip(jnp.floor((out + den / 2) / den), 0.0, max_full)
