"""Per-pixel hashed-filter application (the RAISR core op).

Reference semantics: for each output pixel, gather the learned 11x11 filter
for (hash bucket, pixel phase) and dot it with the centered 11x11 patch of
the cheap-upscaled image (DotProdPatch_*, reference: Raisr_AVX512.cpp:134-149,
filter gather Raisr.cpp:1147-1160).

Two TPU-native formulations, numerically identical up to fp reduction order:

  taps   — accumulate over the 121 taps; per tap a tiny [num_filters] vector
           is gathered per pixel. Exact reference reduction order; runs
           anywhere; used as ground truth.

  conv   — "MoE as dense matmul": patches (x) all 216 bucket filters of one
           pixel phase is a 216-channel 11x11 convolution (stride 2 per phase
           for ratio 2), computed on the MXU, followed by a minor-axis
           take_along_axis with the bucket index. Turns the data-dependent
           gather (TPU-hostile) into dense matmuls + a lane select, at
           216/1-per-pixel FLOP amplification — a good trade on MXU-rich TPUs.
           Row-chunked to bound the [*, 216] intermediate.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def apply_filters_taps(
    cheap: jnp.ndarray,
    filter_idx: jnp.ndarray,
    filters: jnp.ndarray,
    patch_size: int,
) -> jnp.ndarray:
    """Reference formulation. cheap [H,W] f32; filter_idx [H,W] int32 in
    [0, num_filters); filters [num_filters, aligned_taps]."""
    margin = patch_size // 2
    padded = jnp.pad(cheap, margin)
    h, w = cheap.shape

    def body(t, acc):
        taps = lax.dynamic_slice_in_dim(filters, t, 1, axis=1)[:, 0]
        tap_map = jnp.take(taps, filter_idx, axis=0)
        i = t // patch_size
        j = t % patch_size
        shifted = lax.dynamic_slice(padded, (i, j), (h, w))
        return acc + shifted * tap_map

    return lax.fori_loop(
        0, patch_size * patch_size, body, jnp.zeros_like(cheap), unroll=8
    )


def _conv_all_buckets(
    padded_slice: jnp.ndarray, kernels: jnp.ndarray, stride: int, dtype
) -> jnp.ndarray:
    """Valid conv of [h, w] with kernels [216, p, p] -> [oh, ow, 216]."""
    out = lax.conv_general_dilated(
        padded_slice[None, :, :, None].astype(dtype),
        jnp.transpose(kernels, (1, 2, 0))[:, :, None, :].astype(dtype),  # HWIO
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        # f32 operands: bf16x3 MXU passes (~f32; TPU would silently use plain
        # bf16 otherwise); bf16 operands: plain bf16 (FP16-path analog).
        precision=lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT,
    )
    return out[0]


def _chunked_conv_select(
    padded: jnp.ndarray,
    buckets: jnp.ndarray,
    kernels: jnp.ndarray,
    patch_size: int,
    stride: int,
    start: tuple[int, int],
    out_shape: tuple[int, int],
    chunk_rows: int,
    dtype,
) -> jnp.ndarray:
    """Row-chunked (conv over all buckets) + take_along_axis select.

    fori_loop keeps the graph one-conv-sized; the [chunk, w, 216] G tensor
    never exceeds VMEM-friendly chunks and is consumed immediately."""
    out_h, out_w = out_shape
    n_chunks = -(-out_h // chunk_rows)
    pad_h = n_chunks * chunk_rows - out_h
    buckets_p = jnp.pad(buckets, ((0, pad_h), (0, 0)))
    # pad the source so the last chunk's slice stays in range
    padded_p = jnp.pad(padded, ((0, pad_h * stride), (0, 0)))
    out0 = jnp.zeros((n_chunks * chunk_rows, out_w), dtype=jnp.float32)
    slice_h = stride * (chunk_rows - 1) + patch_size
    slice_w = stride * (out_w - 1) + patch_size

    def body(k, acc):
        r = k * chunk_rows
        sl = lax.dynamic_slice(padded_p, (start[0] + r * stride, start[1]), (slice_h, slice_w))
        g = _conv_all_buckets(sl, kernels, stride, dtype)  # [chunk, out_w, 216]
        idx = lax.dynamic_slice(buckets_p, (r, 0), (chunk_rows, out_w))
        sel = jnp.take_along_axis(g, idx[:, :, None], axis=2)[..., 0]
        return lax.dynamic_update_slice(acc, sel, (r, 0))

    out = lax.fori_loop(0, n_chunks, body, out0)
    return out[:out_h]


def apply_filters_conv(
    cheap: jnp.ndarray,
    buckets: jnp.ndarray,
    filters: jnp.ndarray,
    patch_size: int,
    pixel_types: int,
    patch_margin: int,
    ratio: int,
    chunk_rows: int = 128,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Dense-conv formulation. buckets [H,W] int32 in [0, 216);
    filters [216 * pixel_types, aligned]. Returns [H,W] f32.

    For pixel_types == 4 (ratio 2), output pixels of phase
    (pr, pc) = ((r - margin) % 2, (c - margin) % 2) form stride-2 subgrids;
    each phase contracts with its own 216-filter bank via a strided conv.
    """
    h, w = cheap.shape
    margin = patch_size // 2
    padded = jnp.pad(cheap, margin)
    num_buckets = filters.shape[0] // pixel_types
    # kernels[b, pt, i, j]
    kernels = filters[:, : patch_size * patch_size].reshape(
        num_buckets, pixel_types, patch_size, patch_size
    )

    if pixel_types == 1:
        return _chunked_conv_select(
            padded, buckets, kernels[:, 0], patch_size, 1, (0, 0), (h, w),
            chunk_rows, dtype,
        )

    assert pixel_types == ratio * ratio == 4
    out = jnp.zeros((h, w), dtype=jnp.float32)
    for r0 in range(2):
        pr = (r0 - patch_margin) % 2
        for c0 in range(2):
            pc = (c0 - patch_margin) % 2
            pt = pr * 2 + pc
            sub_h = (h - r0 + 1) // 2
            sub_w = (w - c0 + 1) // 2
            sub = _chunked_conv_select(
                padded, buckets[r0::2, c0::2], kernels[:, pt], patch_size, 2,
                (r0, c0), (sub_h, sub_w), chunk_rows, dtype,
            )
            out = out.at[r0::2, c0::2].set(sub)
    return out
