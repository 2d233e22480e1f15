"""Fused filter-apply Pallas kernel (the RAISR hot op on TPU).

Computes, per output pixel, patch(11x11) . F[bucket] — the hashed-filter dot
product that the reference implements as a per-pixel pointer gather + SIMD
dot (reference: Raisr.cpp:1147-1160, Raisr_AVX512.cpp:134-149) and OpenCL as
the `hash_mul` kernel (Raisr_OpenCL_kernel.h:106-168).

TPU-native formulation ("the 216-bucket gather as a dense MXU matmul"):
  - For ratio 2, each of the 4 (row, col) pixel phases owns a [H/2, W/2]
    subgrid and its own 216-filter bank (pixelType, Raisr.cpp:1091-1094).
    One kernel invocation processes a band of 16 full image rows and all 4
    phases, reading the image as two column-parity planes (even/odd lanes)
    so every patch column offset is an unstrided lane slice.
  - Per pair of phase-rows, the kernel assembles the patch matrix
    PT [176, 2*W/2] (taps grouped 16-sublane-aligned per patch column),
    computes G^T = F^T [224, 176] @ PT on the MXU, and selects
    G^T[bucket[c], c] with a one-hot sublane compare + reduce — the
    216-channel G tensor never leaves VMEM (an XLA conv formulation streams
    ~7 GB/frame of G through HBM).
  - The overlapping 11-row halo between bands comes from two Blocked windows
    per plane (the second over a band-shifted slice); the kernel casts its
    band to bfloat16 scratch once, then assembles PT from it.
    (Implementation notes: Element-indexed windows, same-buffer-twice
    operands, and any non-f32 windowed input all make this XLA/libtpu build
    stack-allocate the entire pallas output in scoped VMEM -> OOM for 4K
    outputs. Hence: Blocked windows, distinct slices, f32 plane inputs.)
  - Precision: the patch operand is bfloat16 (exact for 8-bit content);
    filters are split hi + lo bfloat16 (f32 to ~2^-17 relative) -> two MXU
    passes give f32-grade output. For 10/16-bit content a low-order image
    plane is added (mxu_passes=3), the TPU analogue of the reference's
    AVX512-FP16 trade (Raisr_AVX512FP16.cpp).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 216  # hash buckets (Qangle * Qstrength * Qcoherence)
NBP = 224  # sublane-padded bucket count
BLOCK = 16  # sublane-aligned tap rows per patch column (11 data + 5 zero)
ROWBATCH = 2  # default phase-rows batched per matmul (N = ROWBATCH * w2p)


def _round_bf16(x):
    """Round f32 -> bf16 value, keeping f32 dtype. lax.reduce_precision is
    used instead of a cast round-trip: XLA under
    --xla_allow_excess_precision may elide f32->bf16->f32 casts, which would
    silently zero the low-order planes."""
    return lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


def _split_hi_lo(x):
    hi_f32 = _round_bf16(x)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _tree_select(gt, idx):
    """gt[idx[c], c] per column.

    Chained-select formulation: per 8-sublane vreg group v, fold the group
    into an [8, n] accumulator with acc = where(iota8 + 8v == idx, gt_v, acc)
    — 2 VPU ops per group (compare + select) instead of the one-hot
    mask-multiply-add's 3 (compare + select + add), with one final 8-sublane
    reduction. Groups are split into independent chains so the serial where
    dependency doesn't bound the pipeline. Measured vs alternatives that
    LOST: one-hot where+sum (the previous form, 3 ops/group), mult+sum
    (ties one-hot), bucket-bit folding tree, take_along_axis (doesn't
    lower in Mosaic)."""
    nbp, n = gt.shape
    assert nbp % 8 == 0
    n_groups = nbp // 8
    chains = 4
    per = -(-n_groups // chains)
    sub_iota = lax.broadcasted_iota(jnp.int32, (8, n), 0)
    accs = []
    for ch in range(chains):
        lo = ch * per
        hi = min((ch + 1) * per, n_groups)
        if lo >= hi:
            break
        acc = jnp.zeros((8, n), jnp.float32)
        for v in range(lo, hi):
            acc = jnp.where(sub_iota + 8 * v == idx, gt[8 * v : 8 * v + 8, :], acc)
        accs.append(acc)
    total = accs[0]
    for a in accs[1:]:
        total = total + a
    return jnp.sum(total, axis=0, keepdims=True)


def _tree_select_onehot(gt, idx):
    """Previous one-hot form, kept for A/B benchmarking
    (RAISR_SELECT=onehot)."""
    sub_iota = lax.broadcasted_iota(jnp.int32, gt.shape, 0)
    mask = sub_iota == idx
    return jnp.sum(jnp.where(mask, gt, 0.0), axis=0, keepdims=True)


if os.environ.get("RAISR_SELECT") == "onehot":  # pragma: no cover - bench knob
    _tree_select = _tree_select_onehot


def _band_kernel(
    *refs,
    tb2: int,
    w2p: int,
    patch_size: int,
    mxu_passes: int,
    band: int,
    rowbatch: int = ROWBATCH,
):
    # refs: cea, ceb, coa, cob, [cela, celb, cola, colb,]
    #       bkt_e, bkt_o (column-parity, full band rows), f0..f3 (K-packed),
    #       out, ce_s, co_s, [cel_s, col_s,] pt
    it = iter(refs)
    cea, ceb, coa, cob = (next(it) for _ in range(4))
    if mxu_passes >= 3:
        cela, celb, cola, colb = (next(it) for _ in range(4))
    bkt_par = tuple(next(it) for _ in range(2))  # [band, w2p] each
    fs = tuple(next(it) for _ in range(4))
    out_ref = next(it)  # [band, 2 * w2p] f32 — full rows, col-parity halves
    ce_s = next(it)  # [band + 16, plane_w] bf16 scratch
    co_s = next(it)
    if mxu_passes >= 3:
        cel_s = next(it)
        col_s = next(it)
    pt_ref = next(it)  # [mxu_passes * K, n] bf16 — K-packed patch matrix

    # stage this band (+ halo rows from the next band) as bf16
    ce_s[0:band, :] = cea[...].astype(jnp.bfloat16)
    ce_s[band : band + 16, :] = ceb[0:16, :].astype(jnp.bfloat16)
    co_s[0:band, :] = coa[...].astype(jnp.bfloat16)
    co_s[band : band + 16, :] = cob[0:16, :].astype(jnp.bfloat16)
    if mxu_passes >= 3:
        cel_s[0:band, :] = cela[...].astype(jnp.bfloat16)
        cel_s[band : band + 16, :] = celb[0:16, :].astype(jnp.bfloat16)
        col_s[0:band, :] = cola[...].astype(jnp.bfloat16)
        col_s[band : band + 16, :] = colb[0:16, :].astype(jnp.bfloat16)

    # ONE patch block of patch_size+1 rows serves BOTH row phases (taps of
    # phase r0 sit at sublane offset r0 in the f_phase layout) and both
    # column phases (block j' covers tap col j'-c0; zero filter taps mask
    # the unused block per phase) — one staged copy set per base row feeds
    # all four phases.
    n = rowbatch * w2p
    n_blocks = patch_size + 1  # 12 shared tap-column blocks serve both c0s
    k_dim = n_blocks * BLOCK  # 192 per precision slot
    rows_blk = patch_size + 1  # 11 taps + 1 row of r0-phase slack
    dims = (((1,), (0,)), ((), ()))

    # zero tap-pad rows once (0 * garbage could be NaN)
    zpad = jnp.zeros((BLOCK - rows_blk, n), jnp.bfloat16)
    for blk in range(mxu_passes):
        for j in range(n_blocks):
            pt_ref[
                blk * k_dim + j * BLOCK + rows_blk : blk * k_dim + (j + 1) * BLOCK, :
            ] = zpad

    for kb in range(0, tb2, rowbatch):
        for b in range(rowbatch):
            q = 2 * (kb + b)  # staged plane row of the r0=0 patch top
            for j in range(n_blocks):
                parity = (j + 1) % 2
                off = (j + 1) // 2
                plane = ce_s if parity == 0 else co_s
                block = plane[q : q + rows_blk, off : off + w2p]
                pt_ref[
                    j * BLOCK : j * BLOCK + rows_blk,
                    b * w2p : (b + 1) * w2p,
                ] = block
                if mxu_passes >= 2:
                    # hi/lo filter passes ride ONE K-packed matmul
                    # (separate dots keep two [NBP, n] f32 temporaries
                    # live per unrolled iteration and overflow scoped
                    # VMEM); the patch block is written to both K slots
                    pt_ref[
                        k_dim + j * BLOCK : k_dim + j * BLOCK + rows_blk,
                        b * w2p : (b + 1) * w2p,
                    ] = block
                if mxu_passes >= 3:
                    planel = cel_s if parity == 0 else col_s
                    pt_ref[
                        2 * k_dim + j * BLOCK : 2 * k_dim + j * BLOCK + rows_blk,
                        b * w2p : (b + 1) * w2p,
                    ] = planel[q : q + rows_blk, off : off + w2p]

        for r0 in range(2):
            for c0 in range(2):
                f_ref = fs[2 * r0 + c0]
                gt = lax.dot_general(
                    f_ref[...], pt_ref[...], dims, preferred_element_type=jnp.float32
                )

                idx = jnp.concatenate(
                    [
                        bkt_par[c0][2 * (kb + b) + r0 : 2 * (kb + b) + r0 + 1, :]
                        for b in range(rowbatch)
                    ],
                    axis=1,
                )  # [1, n]
                sel = _tree_select(gt, idx)
                for b in range(rowbatch):
                    r_full = 2 * (kb + b) + r0
                    out_ref[r_full : r_full + 1, c0 * w2p : (c0 + 1) * w2p] = sel[
                        :, b * w2p : (b + 1) * w2p
                    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch_size", "pixel_types", "patch_margin", "ratio", "mxu_passes",
        "tb2", "rowbatch", "interpret",
    ),
)
def apply_filters_pallas(
    cheap: jnp.ndarray,  # [H, W] f32 (integer-valued)
    buckets: jnp.ndarray,  # [H, W] int32 in [0, 216)
    filters: jnp.ndarray,  # [216 * pixel_types, 128] f32
    patch_size: int = 11,
    pixel_types: int = 4,
    patch_margin: int = 5,
    ratio: int = 2,
    mxu_passes: int = 2,
    tb2: int = 8,
    rowbatch: int = ROWBATCH,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused filter apply; returns the raw filtered plane [H, W] f32.

    Border pixels (within patch_margin+1 of an edge) are computed from
    zero-padding and are garbage by design — the pipeline masks them out
    (they are outside the reference's processed zone, Raisr.cpp:1038-1066).
    """
    if pixel_types == 1:
        return _apply_filters_single_phase(
            cheap, buckets, filters, patch_size, mxu_passes, tb2, interpret
        )
    assert pixel_types == 4 and ratio == 2

    h, w = cheap.shape
    m = patch_size // 2
    n_taps = patch_size * patch_size
    k_dim = (patch_size + 1) * BLOCK  # 192: 12 shared tap-column blocks
    band = 2 * tb2  # full image rows per grid step

    h2 = -(-h // 2)
    w2 = -(-w // 2)
    h2p = _pad_to(h2, tb2)
    w2p = _pad_to(w2, 128)
    plane_w = w2p + 128

    n_tiles = h2p // tb2
    top = m  # patch top of band i's first output row = padded row band*i
    # rows required: (n_tiles + 1) * band for the band-shifted window
    bottom = (n_tiles + 1) * band - (h + top)
    left = m + 1
    right = 2 * plane_w - w - left

    padded = jnp.pad(cheap, ((top, bottom), (left, right)))
    planes = [padded[:, 0::2], padded[:, 1::2]]  # f32 (see module docstring)
    if mxu_passes >= 3:
        lo = padded - _round_bf16(padded)
        planes.append(lo[:, 0::2])
        planes.append(lo[:, 1::2])

    # per-phase filters^T against the 12 shared tap-column blocks: phase
    # (r0, c0) maps block j' to tap col j'-c0 (block c0==0? 11 : 0 is zero);
    # K-packed per precision pass: [fhi | flo | fhi] matching pt [hi|hi|lo]
    f_all = filters[:, :n_taps].reshape(NB, pixel_types, patch_size, patch_size)
    n_blocks = patch_size + 1
    f_phase = []
    for r0, c0 in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        pt_idx = ((r0 - patch_margin) % 2) * 2 + ((c0 - patch_margin) % 2)
        fp = jnp.zeros((NBP, n_blocks, BLOCK), jnp.float32)
        # block j' = c0 + j holds tap column j; sublane offset r0 lets both
        # row phases share one staged patch matrix (see _band_kernel)
        fp = fp.at[:NB, c0 : c0 + patch_size, r0 : r0 + patch_size].set(
            jnp.transpose(f_all[:, pt_idx], (0, 2, 1))
        )
        fhi, flo = _split_hi_lo(fp.reshape(NBP, k_dim))
        parts = [fhi, flo, fhi][:mxu_passes]
        f_phase.append(jnp.concatenate(parts, axis=1))

    # buckets as two column-parity arrays (1-D lane strides only: 2-D
    # strided slices cost ~75 ms each on this toolchain); row phases are
    # separated inside the kernel with static row indexing
    bkt_rows = 2 * h2p
    bkts = []
    for c0 in range(2):
        b = buckets[:, c0::2]
        bkts.append(
            jnp.pad(b, ((0, bkt_rows - b.shape[0]), (0, w2p - b.shape[1])))
        )

    # Canonical leading-dim blocking: every windowed operand is reshaped to
    # [n_tiles, rows, cols] and blocked (None, rows, cols) on dim 0 — 2-D
    # advancing windows make this XLA/libtpu build stack-allocate the whole
    # pallas output in scoped VMEM. The band halo comes from a second,
    # band-shifted 3-D view of each plane.
    plane_spec = pl.BlockSpec(
        (None, band, plane_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bkt_spec = pl.BlockSpec(
        (None, band, w2p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (NBP, mxu_passes * k_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    # output: full rows x column-parity halves (even cols at lanes [0, w2p),
    # odd at [w2p, 2*w2p)) -> one cheap lane-interleave at the end
    out_spec = pl.BlockSpec(
        (None, band, 2 * w2p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _band_kernel,
        tb2=tb2,
        w2p=w2p,
        patch_size=patch_size,
        mxu_passes=mxu_passes,
        band=band,
        rowbatch=rowbatch,
    )
    n_stage = 2 if mxu_passes < 3 else 4
    scratch = [pltpu.VMEM((band + 16, plane_w), jnp.bfloat16) for _ in range(n_stage)]
    scratch.append(pltpu.VMEM((mxu_passes * k_dim, rowbatch * w2p), jnp.bfloat16))

    plane_specs = []
    plane_args = []
    for pln in planes:
        plane_specs.extend([plane_spec, plane_spec])
        plane_args.append(pln[: n_tiles * band].reshape(n_tiles, band, plane_w))
        plane_args.append(
            pln[band : (n_tiles + 1) * band].reshape(n_tiles, band, plane_w)
        )
    bkt_args = [b.reshape(n_tiles, band, w2p) for b in bkts]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=plane_specs + [bkt_spec] * 2 + [f_spec] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, band, 2 * w2p), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, *bkt_args, *f_phase)
    out = out.reshape(2 * h2p, 2 * w2p)

    # single lane-interleave of the column-parity halves
    oute = out[:, :w2p]
    outo = out[:, w2p : 2 * w2p]
    full = jnp.stack([oute, outo], axis=2).reshape(2 * h2p, 2 * w2p)
    return full[:h, :w]


# ---------------------------------------------------------------------------
# single-phase variant (ratio 1.5 / pixel_types == 1)
# ---------------------------------------------------------------------------


def _single_kernel(
    *refs,
    tbr: int,
    wp: int,
    patch_size: int,
    mxu_passes: int,
    band: int,
):
    it = iter(refs)
    pa, pb = next(it), next(it)
    if mxu_passes >= 3:
        pla, plb = next(it), next(it)
    bkt_ref = next(it)
    f_ref = next(it)  # [NBP, mxu_passes * K] packed
    out_ref = next(it)
    p_s = next(it)  # [band + 16, plane_w] bf16 staging
    if mxu_passes >= 3:
        pl_s = next(it)
    pt_ref = next(it)  # [mxu_passes * K, n] bf16 K-packed

    p_s[0:band, :] = pa[...].astype(jnp.bfloat16)
    p_s[band : band + 16, :] = pb[0:16, :].astype(jnp.bfloat16)
    if mxu_passes >= 3:
        pl_s[0:band, :] = pla[...].astype(jnp.bfloat16)
        pl_s[band : band + 16, :] = plb[0:16, :].astype(jnp.bfloat16)

    n = ROWBATCH * wp
    k_dim = patch_size * BLOCK
    dims = (((1,), (0,)), ((), ()))
    zpad = jnp.zeros((BLOCK - patch_size, n), jnp.bfloat16)
    for j in range(patch_size):
        pt_ref[j * BLOCK + patch_size : (j + 1) * BLOCK, :] = zpad
        if mxu_passes >= 3:
            pt_ref[2 * k_dim + j * BLOCK + patch_size : 2 * k_dim + (j + 1) * BLOCK, :] = zpad

    for kb in range(0, tbr, ROWBATCH):
        for b in range(ROWBATCH):
            k = kb + b
            for j in range(patch_size):
                # padded col of tap j for output col c: c + j + 1
                pt_ref[
                    j * BLOCK : j * BLOCK + patch_size, b * wp : (b + 1) * wp
                ] = p_s[k : k + patch_size, j + 1 : j + 1 + wp]
                if mxu_passes >= 3:
                    pt_ref[
                        2 * k_dim + j * BLOCK : 2 * k_dim + j * BLOCK + patch_size,
                        b * wp : (b + 1) * wp,
                    ] = pl_s[k : k + patch_size, j + 1 : j + 1 + wp]
        if mxu_passes >= 2:
            pt_ref[k_dim : 2 * k_dim, :] = pt_ref[0:k_dim, :]
        gt = lax.dot_general(
            f_ref[...], pt_ref[...], dims, preferred_element_type=jnp.float32
        )
        idx = jnp.concatenate(
            [bkt_ref[kb + b : kb + b + 1, :] for b in range(ROWBATCH)], axis=1
        )
        sel = _tree_select(gt, idx)
        for b in range(ROWBATCH):
            out_ref[kb + b : kb + b + 1, :] = sel[:, b * wp : (b + 1) * wp]


def _apply_filters_single_phase(
    cheap, buckets, filters, patch_size, mxu_passes, tb2, interpret
):
    h, w = cheap.shape
    m = patch_size // 2
    n_taps = patch_size * patch_size
    k_dim = patch_size * BLOCK

    tbr = 2 * tb2  # output rows per band (stride 1)
    band = tbr
    hp = _pad_to(h, tbr)
    wp = _pad_to(w, 128)
    plane_w = wp + 128

    n_tiles = hp // tbr
    top = m  # band i's first patch row sits at padded row band*i
    bottom = (n_tiles + 1) * band - (h + top)
    left = m + 1
    right = plane_w - w - left

    padded = jnp.pad(cheap, ((top, bottom), (left, right)))
    planes = [padded]
    if mxu_passes >= 3:
        planes.append(padded - _round_bf16(padded))

    f_pt = jnp.zeros((NBP, patch_size, BLOCK), jnp.float32)
    f_all = filters[:, :n_taps].reshape(NB, patch_size, patch_size)
    f_pt = f_pt.at[:NB, :, :patch_size].set(jnp.transpose(f_all, (0, 2, 1)))
    fhi, flo = _split_hi_lo(f_pt.reshape(NBP, k_dim))
    f_packed = jnp.concatenate([fhi, flo, fhi][:mxu_passes], axis=1)

    bkt = jnp.pad(buckets, ((0, hp - h), (0, wp - w)))

    # leading-dim blocking (see the 4-phase variant)
    plane_spec = pl.BlockSpec(
        (None, band, plane_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _single_kernel, tbr=tbr, wp=wp, patch_size=patch_size,
        mxu_passes=mxu_passes, band=band,
    )
    n_stage = 1 if mxu_passes < 3 else 2
    scratch = [pltpu.VMEM((band + 16, plane_w), jnp.bfloat16) for _ in range(n_stage)]
    scratch.append(pltpu.VMEM((mxu_passes * k_dim, ROWBATCH * wp), jnp.bfloat16))

    plane_specs = []
    plane_args = []
    for pln in planes:
        plane_specs.extend([plane_spec, plane_spec])
        plane_args.append(pln[: n_tiles * band].reshape(n_tiles, band, plane_w))
        plane_args.append(
            pln[band : (n_tiles + 1) * band].reshape(n_tiles, band, plane_w)
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=plane_specs
        + [
            pl.BlockSpec((None, tbr, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (NBP, mxu_passes * k_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, tbr, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tbr, wp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, bkt.reshape(n_tiles, tbr, wp), f_packed)
    return out.reshape(hp, wp)[:h, :w]


# ---------------------------------------------------------------------------
# fully-fused variant: gradients + structure tensor + hash computed in-kernel
# (ratio 2 / pixel_types == 4)
# ---------------------------------------------------------------------------


def _band_kernel_fused(
    *refs,
    tb2: int,
    w2p: int,
    plane_w: int,
    patch_size: int,
    mxu_passes: int,
    band: int,
    rowbatch: int,
    k1d: tuple,
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int,
    qstrength: int,
    qcoherence: int,
):
    """Per 16-row band: stage f32 planes, compute gradients + separable
    Gaussian structure tensor + hash buckets (GetHashValue semantics,
    reference Raisr_AVX512.cpp:175-258) for both column parities, then run
    the shared-block PT assembly + MXU G-matmul + select of _band_kernel.

    Window-local row l corresponds to full image row band*i - 6 + l
    (top pad = patch_margin + 1 so gradients of the tensor support rows are
    in range)."""
    from raisr_tpu.ops.hashing import atan2_approx

    def _roll(x, shift):
        # pltpu.roll requires non-negative shifts; wrap circularly (the
        # wrapped lanes only pollute masked border columns)
        return pltpu.roll(x, shift % x.shape[1], axis=1)

    it = iter(refs)
    cea, ceb, coa, cob = (next(it) for _ in range(4))
    if mxu_passes >= 3:
        cela, celb, cola, colb = (next(it) for _ in range(4))
    fs = tuple(next(it) for _ in range(4))
    out_ref = next(it)  # [band, 2 * w2p] f32
    cf_e = next(it)  # [band + 16, plane_w] f32 staging
    cf_o = next(it)
    ce_s = next(it)  # [band + 16, plane_w] bf16 staging
    co_s = next(it)
    if mxu_passes >= 3:
        cel_s = next(it)
        col_s = next(it)
    bkt_scr = (next(it), next(it))  # int32 [band, w2p] per column parity
    pt_ref = next(it)

    # ---- stage -----------------------------------------------------------
    cf_e[0:band, :] = cea[...]
    cf_e[band : band + 16, :] = ceb[0:16, :]
    cf_o[0:band, :] = coa[...]
    cf_o[band : band + 16, :] = cob[0:16, :]
    ce_s[...] = cf_e[...].astype(jnp.bfloat16)
    co_s[...] = cf_o[...].astype(jnp.bfloat16)
    if mxu_passes >= 3:
        cel_s[0:band, :] = cela[...].astype(jnp.bfloat16)
        cel_s[band : band + 16, :] = celb[0:16, :].astype(jnp.bfloat16)
        col_s[0:band, :] = cola[...].astype(jnp.bfloat16)
        col_s[band : band + 16, :] = colb[0:16, :].astype(jnp.bfloat16)

    # ---- gradients (rows l+1 for l in [0, band+12)) ------------------------
    rows_g = band + 12
    E = cf_e[0 : rows_g + 2, :]
    O = cf_o[0 : rows_g + 2, :]
    gx_e = E[2:, :] - E[:-2, :]  # vertical gradient at even cols
    gx_o = O[2:, :] - O[:-2, :]
    Em = E[1:-1, :]
    Om = O[1:-1, :]
    gy_e = Om - _roll(Om, 1)  # cheap[f+1] - cheap[f-1], f even
    gy_o = _roll(Em, -1) - Em  # f odd

    # ---- separable Gaussian structure tensor ------------------------------
    def vert(mp):
        acc = None
        for i, kv in enumerate(k1d):
            t = mp[i : i + band, :] * kv
            acc = t if acc is None else acc + t
        return acc  # [band, plane_w]

    v_maps = {}
    for par, gx, gy in (("e", gx_e, gy_e), ("o", gx_o, gy_o)):
        v_maps[par] = (vert(gx * gx), vert(gx * gy), vert(gy * gy))

    # horizontal pass with parity mixing; output plane index base 3
    # (full col f=2c-6 for parity e / 2c-5 for parity o at plane idx c)
    def horiz(par):
        outs = []
        for comp in range(3):
            acc = None
            for j, kv in enumerate(k1d):
                if par == "e":
                    src_par = "e" if j % 2 == 1 else "o"
                    off = (j - 5) // 2 if j % 2 == 1 else (j - 6) // 2
                else:
                    src_par = "e" if j % 2 == 0 else "o"
                    off = (j - 4) // 2 if j % 2 == 0 else (j - 5) // 2
                t = _roll(v_maps[src_par][comp], -off) * kv
                acc = t if acc is None else acc + t
            outs.append(acc * nf)
        return outs  # a, b, d [band, plane_w]

    # ---- hash (AVX-512 tie semantics) --------------------------------------
    for c0, par in ((0, "e"), (1, "o")):
        a, b, d = horiz(par)
        a = a[:, 3 : 3 + w2p]
        b = b[:, 3 : 3 + w2p]
        d = d[:, 3 : 3 + w2p]
        t_tr = a + d
        det = a * d - b * b
        disc = jnp.maximum(t_tr * t_tr * 0.25 - det, 0.0)
        sqr = jnp.sqrt(disc)
        l1 = t_tr * 0.5 + sqr
        l2 = jnp.maximum(t_tr * 0.5 - sqr, 0.0)
        x = jnp.where(b != 0.0, l1 - d, 1.0)
        angle = atan2_approx(b, x)
        angle = angle + jnp.where(angle < 0.0, jnp.float32(3.14159265358979), 0.0)
        sl1 = jnp.sqrt(l1)
        sl2 = jnp.sqrt(l2)
        coh = (sl1 - sl2) / (sl1 + sl2 + 1e-17)
        ai = jnp.clip(
            jnp.floor(angle * (qangle / 3.14159265358979)).astype(jnp.int32),
            0,
            qangle - 1,
        )
        si = jnp.zeros_like(ai)
        for edge in qstr:
            si = si + (jnp.float32(edge) <= l1).astype(jnp.int32)
        ci = jnp.zeros_like(ai)
        for edge in qcoh:
            ci = ci + (jnp.float32(edge) <= coh).astype(jnp.int32)
        bkt_scr[c0][...] = ai * (qstrength * qcoherence) + si * qcoherence + ci

    # ---- shared-block PT + MXU matmul + select (as _band_kernel, with the
    # +1 row offset from the deeper top pad) --------------------------------
    n = rowbatch * w2p
    n_blocks = patch_size + 1
    k_dim = n_blocks * BLOCK
    dims = (((1,), (0,)), ((), ()))

    zpad = jnp.zeros((BLOCK - patch_size, n), jnp.bfloat16)
    for blk in range(mxu_passes):
        for j in range(n_blocks):
            pt_ref[
                blk * k_dim + j * BLOCK + patch_size : blk * k_dim + (j + 1) * BLOCK, :
            ] = zpad

    for r0 in range(2):
        for kb in range(0, tb2, rowbatch):
            for b in range(rowbatch):
                r = 2 * (kb + b) + r0 + 1  # +1: top pad is margin+1
                for j in range(n_blocks):
                    parity = (j + 1) % 2
                    off = (j + 1) // 2
                    plane = ce_s if parity == 0 else co_s
                    block = plane[r : r + patch_size, off : off + w2p]
                    pt_ref[
                        j * BLOCK : j * BLOCK + patch_size,
                        b * w2p : (b + 1) * w2p,
                    ] = block
                    if mxu_passes >= 2:
                        pt_ref[
                            k_dim + j * BLOCK : k_dim + j * BLOCK + patch_size,
                            b * w2p : (b + 1) * w2p,
                        ] = block
                    if mxu_passes >= 3:
                        planel = cel_s if parity == 0 else col_s
                        pt_ref[
                            2 * k_dim + j * BLOCK : 2 * k_dim + j * BLOCK + patch_size,
                            b * w2p : (b + 1) * w2p,
                        ] = planel[r : r + patch_size, off : off + w2p]

            for c0 in range(2):
                f_ref = fs[2 * r0 + c0]
                gt = lax.dot_general(
                    f_ref[...], pt_ref[...], dims, preferred_element_type=jnp.float32
                )
                idx = jnp.concatenate(
                    [
                        bkt_scr[c0][2 * (kb + b) + r0 : 2 * (kb + b) + r0 + 1, :]
                        for b in range(rowbatch)
                    ],
                    axis=1,
                )
                sel = _tree_select(gt, idx).astype(jnp.float32)
                for b in range(rowbatch):
                    r_full = 2 * (kb + b) + r0
                    out_ref[r_full : r_full + 1, c0 * w2p : (c0 + 1) * w2p] = sel[
                        :, b * w2p : (b + 1) * w2p
                    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k1d", "nf", "qstr", "qcoh", "qangle", "qstrength", "qcoherence",
        "patch_size", "patch_margin", "mxu_passes", "tb2", "rowbatch",
        "interpret",
    ),
)
def apply_filters_hash_pallas(
    cheap: jnp.ndarray,  # [H, W] f32 (integer-valued)
    filters: jnp.ndarray,  # [864, 128] f32
    k1d: tuple,  # gaussian 1-D kernel (floats)
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int = 24,
    qstrength: int = 3,
    qcoherence: int = 3,
    patch_size: int = 11,
    patch_margin: int = 5,
    mxu_passes: int = 2,
    tb2: int = 8,
    rowbatch: int = ROWBATCH,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fully-fused hash + filter apply (ratio 2): cheap plane in, raw
    filtered plane out; gradients/structure tensor/hash never touch HBM."""
    pixel_types = 4
    h, w = cheap.shape
    m = patch_size // 2
    n_taps = patch_size * patch_size
    k_dim = (patch_size + 1) * BLOCK
    band = 2 * tb2

    h2 = -(-h // 2)
    w2 = -(-w // 2)
    h2p = _pad_to(h2, tb2)
    w2p = _pad_to(w2, 128)
    plane_w = w2p + 128

    n_tiles = h2p // tb2
    top = m + 1  # gradient of the first tensor-support row needs one more
    bottom = (n_tiles + 1) * band - (h + top)
    left = m + 1
    right = 2 * plane_w - w - left

    padded = jnp.pad(cheap, ((top, bottom), (left, right)))
    planes = [padded[:, 0::2], padded[:, 1::2]]
    if mxu_passes >= 3:
        lo = padded - _round_bf16(padded)
        planes.append(lo[:, 0::2])
        planes.append(lo[:, 1::2])

    f_all = filters[:, :n_taps].reshape(NB, pixel_types, patch_size, patch_size)
    n_blocks = patch_size + 1
    f_phase = []
    for r0, c0 in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        pt_idx = ((r0 - patch_margin) % 2) * 2 + ((c0 - patch_margin) % 2)
        fp = jnp.zeros((NBP, n_blocks, BLOCK), jnp.float32)
        fp = fp.at[:NB, c0 : c0 + patch_size, :patch_size].set(
            jnp.transpose(f_all[:, pt_idx], (0, 2, 1))
        )
        fhi, flo = _split_hi_lo(fp.reshape(NBP, k_dim))
        parts = [fhi, flo, fhi][:mxu_passes]
        f_phase.append(jnp.concatenate(parts, axis=1))

    plane_spec = pl.BlockSpec(
        (None, band, plane_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (NBP, mxu_passes * k_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (None, band, 2 * w2p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _band_kernel_fused,
        tb2=tb2,
        w2p=w2p,
        plane_w=plane_w,
        patch_size=patch_size,
        mxu_passes=mxu_passes,
        band=band,
        rowbatch=rowbatch,
        k1d=k1d,
        nf=nf,
        qstr=qstr,
        qcoh=qcoh,
        qangle=qangle,
        qstrength=qstrength,
        qcoherence=qcoherence,
    )
    scratch = [pltpu.VMEM((band + 16, plane_w), jnp.float32) for _ in range(2)]
    n_stage = 2 if mxu_passes < 3 else 4
    scratch += [pltpu.VMEM((band + 16, plane_w), jnp.bfloat16) for _ in range(n_stage)]
    scratch += [pltpu.VMEM((band, w2p), jnp.int32) for _ in range(2)]
    scratch.append(pltpu.VMEM((mxu_passes * k_dim, rowbatch * w2p), jnp.bfloat16))

    plane_specs = []
    plane_args = []
    for pln in planes:
        plane_specs.extend([plane_spec, plane_spec])
        plane_args.append(pln[: n_tiles * band].reshape(n_tiles, band, plane_w))
        plane_args.append(
            pln[band : (n_tiles + 1) * band].reshape(n_tiles, band, plane_w)
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=plane_specs + [f_spec] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, band, 2 * w2p), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, *f_phase)
    out = out.reshape(2 * h2p, 2 * w2p)

    oute = out[:, :w2p]
    outo = out[:, w2p : 2 * w2p]
    full = jnp.stack([oute, outo], axis=2).reshape(2 * h2p, 2 * w2p)
    return full[:h, :w]
