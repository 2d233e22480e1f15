"""Whole-pass fused Pallas kernel: cheap plane in -> final pass output out.

Extends ops/pallas/filter_kernel.py's fused hash+filter kernel with the pass
epilogue (range reject, census-transform blending, zone masks, rounding —
reference semantics per Raisr.cpp:1196-1277) so one kernel implements the
entire RAISR pass body for ratio 2: the gradients, structure tensor, hash
buckets, G tensor, raw filter outputs, and census intermediates never touch
HBM. Only the cheap-upscaled plane enters and the final integer-valued plane
leaves.

Blending happens at band rows using raw/reject values of neighbor rows, so
each band computes raw for rows [-1, band+1) (one halo row re-computed per
side instead of an inter-band exchange — the same trade the reference makes
with halo-expanded thread segments, Raisr.cpp:1742-1779)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisr_tpu.ops.pallas.filter_kernel import (
    NB,
    BLOCK,
    _round_bf16,
    _split_hi_lo,
    _pad_to,
    _tree_select,
)


_ABLATE = os.environ.get("RAISR_ABLATE", "")  # bench-only: skip a stage


def _round_bf16_error_diffused(f: jnp.ndarray) -> jnp.ndarray:
    """Round filter taps to bf16 with error diffusion along the last axis.

    For the single-matmul bf16 tier the only precision loss is the filter
    rounding: raw error = sum_k eps_k x_k with eps_k the per-tap rounding
    residual. Patches are strongly correlated (11x11 local windows), so the
    DC term (sum_k eps_k) * mean(x) dominates. Carrying the running residual
    into the next tap's rounding keeps |sum_k eps_k| under one ulp of a
    single tap instead of a 121-step random walk — measured +10.4 dB vs the
    compiled reference's f32 output (52.3 -> 62.6 dB, maxdiff 14 -> 6 on the
    parity-content 2-pass run), for free: no runtime cost, the taps are
    already bf16-representable when the kernel later casts them. That places
    the bf16 tier strictly inside the reference's own AVX512FP16-vs-f32
    envelope (54.7 dB, maxdiff 8 on the same content —
    tests/test_reference_parity.py::test_bf16_tier_inside_reference_fp16_envelope).

    Runs at trace time over the [*, n_taps] filter table (tiny)."""
    from raisr_tpu.ops.pallas.filter_kernel import _round_bf16

    carry = jnp.zeros(f.shape[:-1], f.dtype)
    qs = []
    for k in range(f.shape[-1]):
        q = _round_bf16(f[..., k] + carry)
        carry = carry + f[..., k] - q
        qs.append(q)
    return jnp.stack(qs, axis=-1)


def _round_int_error_diffused(f: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round filter taps onto the integer grid `round(f * scale)` with error
    diffusion along the last (tap) axis — the fixed-point analogue of
    _round_bf16_error_diffused for the int8-pair tier. Returns the INTEGER
    values (f32-held), clamped to the balanced hi/lo int8 pair range."""
    carry = jnp.zeros(f.shape[:-1], f.dtype)
    qs = []
    for k in range(f.shape[-1]):
        q = jnp.clip(jnp.round((f[..., k] + carry) * scale), -32896.0, 32639.0)
        carry = carry + f[..., k] - q / scale
        qs.append(q)
    return jnp.stack(qs, axis=-1)


def _full_kernel(
    *refs,
    tb2: int,
    w2p: int,
    plane_w: int,
    patch_size: int,
    mxu_passes: int,
    band: int,
    rowbatch: int,
    cchunk: int,
    gchunk_req: int,
    hashloop_req: bool,
    mpack: bool,
    k1d: tuple,
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int,
    qstrength: int,
    qcoherence: int,
    h_total: int,
    w_total: int,
    min_val: int,
    max_val: int,
    blending: int,
    col_end: int,
    frame_h: int,
    frame_pad: int,
    zone_h: int,
    p_split: bool,
    ftrans: bool,
    i8: bool,
    pcenter: float,
):
    from raisr_tpu.ops.hashing import atan2_approx

    def _roll(x, shift):
        return pltpu.roll(x, shift % x.shape[1], axis=1)

    it = iter(refs)
    cea, ceb, coa, cob = (next(it) for _ in range(4))
    fs = tuple(next(it) for _ in range(1 if mpack else 4))
    if i8:
        # int8-pair tier: fs[0] is [8*NB, k_dim] int8 (hi rows above lo
        # rows of the int16 fixed-point filters); bias = 128*rowsum(Fq)
        # undoes the patch -128 shift, inv = 1/scale applied post-select
        bias_ref = next(it)  # [4 * NB, 128] int32 (lane-replicated)
        inv_ref = next(it)  # SMEM [1] f32
    elif pcenter:
        # patch-centering bias (10/16-bit single-slot tier): undoes the
        # -pcenter patch shift post-matmul, pcenter * rowsum(F) per bucket
        pbias_ref = next(it)  # [4 * NB, 128] f32 (lane-replicated)
    row0_ref = next(it)  # SMEM [1] int32: global row of plane row 0 (stripes)
    out_ref = next(it)  # [band, 2 * w2p] f32 — final values, col-parity halves
    cf = (next(it), next(it))  # f32 staging [band + 16, plane_w] (e, o)
    ce_s = next(it)  # bf16 staging
    co_s = next(it)
    need_lo = mxu_passes >= 3 or p_split
    if need_lo:
        cel_s = next(it)
        col_s = next(it)
    bkt_scr = (next(it), next(it))  # int32 [band + 8, w2p]
    raw_scr = (next(it), next(it))  # f32 [band + 8, w2p]
    if i8:
        pt8_ref = next(it)  # int8 [k_dim, rowbatch * w2p]
    pt_refs = tuple(it)  # 1 or 2 PT buffers (2 = double-buffered groups)

    cf_e, cf_o = cf
    # ---- stage (local plane row l <-> full row band*i - 7 + l) -------------
    cf_e[0:band, :] = cea[...]
    cf_e[band : band + 16, :] = ceb[0:16, :]
    cf_o[0:band, :] = coa[...]
    cf_o[band : band + 16, :] = cob[0:16, :]
    if pcenter:
        # 10/16-bit single-slot tier: center values at pcenter before the
        # bf16 cast. 10-bit video values sit in [64, 940]; centered at 512
        # every |v-512| < 256 is exact in bf16 and the worst-case rounding
        # error halves (ulp 2 vs 4) — the matmul bias adds pcenter*rowsum(F)
        # back, the same shift trick the int8 tier uses for its -128.
        ce_s[...] = (cf_e[...] - jnp.float32(pcenter)).astype(jnp.bfloat16)
        co_s[...] = (cf_o[...] - jnp.float32(pcenter)).astype(jnp.bfloat16)
    else:
        ce_s[...] = cf_e[...].astype(jnp.bfloat16)
        co_s[...] = cf_o[...].astype(jnp.bfloat16)
    if need_lo:
        # 10/16-bit: the low-order plane (value - bf16(value)) is derived
        # IN-KERNEL from the staged planes — no extra HBM streams. The hi
        # value is read back from the bf16 staging buffer (NOT via
        # lax.reduce_precision, which has no Mosaic lowering, and not via
        # an inline cast round-trip a compiler could fold away).
        be = cf_e[...] - jnp.float32(pcenter) if pcenter else cf_e[...]
        bo = cf_o[...] - jnp.float32(pcenter) if pcenter else cf_o[...]
        cel_s[...] = (be - ce_s[...].astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        col_s[...] = (bo - co_s[...].astype(jnp.float32)).astype(
            jnp.bfloat16
        )

    # ---- gradients ---------------------------------------------------------
    # gx_*[j] = vertical gradient at local row j+1, j in [0, band+14)
    rows_g = band + 14
    E = cf_e[0 : rows_g + 2, :]
    O = cf_o[0 : rows_g + 2, :]
    gx_e = E[2:, :] - E[:-2, :]
    gx_o = O[2:, :] - O[:-2, :]
    Em = E[1:-1, :]
    Om = O[1:-1, :]
    gy_e = Om - _roll(Om, 1)
    gy_o = _roll(Em, -1) - Em

    # ---- separable structure tensor ----------------------------------------
    # raw rows t in [-1, band+2); tensor support local rows t+2..t+12;
    # vert output index t' = t+1 in [0, band+3)
    n_vert = band + 3
    nk = len(k1d)
    # Gaussian-symmetry tap pairing is OFF by default: on an FMA machine
    # the unpaired conv is 11 FMAs while pairing is 5 adds + 6 FMAs with a
    # serial add->FMA dependency — measured A/B (tb2=40, mxu2, same day):
    # paired 10.017 vs unpaired 9.830 ms/pass. RAISR_ABLATE=pair re-enables
    # for reproduction.
    k_sym = (
        all(k1d[i] == k1d[nk - 1 - i] for i in range(nk))
        and _ABLATE == "pair"
    )

    # RAISR_ABLATE=vconv_mxu: vertical tensor conv as a banded-matrix MXU
    # matmul (the NOTES.md VPU-floor lever): B [n_vert, band+14] is a
    # Toeplitz band of k1d built from iota compares. Measured FASTER on
    # hardware (same-day A/B, tb2=40, 4K: mxu1 6.976 vs 7.494 ms/pass =
    # -6.9%; mxu2 9.662 vs 9.783 = -1.2%) but DEFAULT OFF: the MXU's tiled
    # K-accumulation makes the conv's f32 rounding depend on the output
    # row's position inside the band (the FMA chain sums the same 11 taps
    # in the same order at every row), which (a) breaks the batched
    # stack's bit-identity to per-frame processing — frames sit at
    # different band offsets (tpu_check frame_stacking_batched failed on
    # real hardware; interpret mode evaluates the matmul exactly and
    # can't see it) — and (b) grew hardware parity drift vs the exact
    # taps path ~10x on the f32-grade tier (mxu2 frac>0 0.00044->0.00451,
    # max 41->78 LSB). Rescuing the win needs band-aligned frame pitch in
    # the stacked/striped/single geometries (see NOTES.md).
    use_vmxu = _ABLATE == "vconv_mxu"
    if use_vmxu:
        ri = lax.broadcasted_iota(jnp.int32, (n_vert, rows_g), 0)
        ci = lax.broadcasted_iota(jnp.int32, (n_vert, rows_g), 1)
        vband = None
        for i, kv in enumerate(k1d):
            t = jnp.where(ci == ri + i, jnp.float32(kv), jnp.float32(0.0))
            vband = t if vband is None else vband + t

    # gradient-product maps stay whole-band SSA values: the per-row-range
    # vert conv below slices them, so every product element is computed once
    # whether the hash runs as a prologue or per matmul group (hashloop)
    prods = {}
    for par, gx, gy in (("e", gx_e, gy_e), ("o", gx_o, gy_o)):
        prods[par] = (gx * gx, gx * gy, gy * gy)

    def vert_rows(mp, lo, hi):
        # vert-conv output rows [lo, hi): row v reads mp rows v..v+nk-1 with
        # the same per-row tap order as the whole-band form — the sliced
        # (hashloop) and prologue schedules are therefore bit-identical
        if use_vmxu:
            return lax.dot_general(
                vband[lo:hi, :], mp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if not k_sym:
            acc = None
            for i, kv in enumerate(k1d):
                t = mp[lo + i : hi + i, :] * kv
                acc = t if acc is None else acc + t
            return acc
        acc = None
        for i in range(nk // 2):
            i2 = nk - 1 - i
            t = (mp[lo + i : hi + i, :] + mp[lo + i2 : hi + i2, :]) * k1d[i]
            acc = t if acc is None else acc + t
        mid = nk // 2
        return acc + mp[lo + mid : hi + mid, :] * k1d[mid]

    # ---- hash (tensor conv + eigenanalysis + quantization) ------------------
    def compute_hash_rows(lo, hi):
        """Write bucket indices for vert rows [lo, hi) of both col parities."""
        v_maps = {
            par: tuple(vert_rows(mp, lo, hi) for mp in prods[par])
            for par in ("e", "o")
        }

        def horiz(par):
            def src_off(j):
                """(source parity plane, lane offset) of horizontal tap j."""
                if par == "e":
                    if j % 2 == 1:
                        return "e", (j - 5) // 2
                    return "o", (j - 6) // 2
                if j % 2 == 0:
                    return "e", (j - 4) // 2
                return "o", (j - 5) // 2

            outs = []
            for comp in range(3):
                acc = None
                for j in range(nk // 2 + 1 if k_sym else nk):
                    sp1, off1 = src_off(j)
                    t = _roll(v_maps[sp1][comp], -off1)
                    j2 = nk - 1 - j
                    if k_sym and j2 != j:
                        # mirrored tap has the same parity class -> same source
                        sp2, off2 = src_off(j2)
                        t = t + _roll(v_maps[sp2][comp], -off2)
                    t = t * k1d[j]
                    acc = t if acc is None else acc + t
                outs.append(acc * nf)
            return outs

        for c0, par in ((0, "e"), (1, "o")):
            a, b, d = horiz(par)
            a = a[:, 3 : 3 + w2p]
            b = b[:, 3 : 3 + w2p]
            d = d[:, 3 : 3 + w2p]
            t_tr = a + d
            det = a * d - b * b
            sqr = jnp.sqrt(jnp.maximum(t_tr * t_tr * 0.25 - det, 0.0))
            l1 = t_tr * 0.5 + sqr
            l2 = jnp.maximum(t_tr * 0.5 - sqr, 0.0)
            x = jnp.where(b != 0.0, l1 - d, 1.0)
            angle = atan2_approx(b, x)
            angle = angle + jnp.where(
                angle < 0.0, jnp.float32(3.14159265358979), 0.0
            )
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
            bkt_scr[c0][lo:hi, :] = (
                ai * (qstrength * qcoherence) + si * qcoherence + ci
            )

    # hashloop (static arg; RAISR_ABLATE=hashloop forces it for A/B runs):
    # instead of hashing the whole band up front, hash each matmul group's
    # rows BETWEEN that group's async dot_general issue and its selects.
    # The tensor conv + hash are independent of the matmul, so Mosaic's
    # scheduler gets ~3 ms/pass of VPU work it may co-issue under the MXU
    # (the stages are otherwise measured strictly additive —
    # docs/PERFORMANCE.md). Values are bit-identical by construction:
    # identical element ops in identical per-row order, only program
    # position changes (asserted in tests/test_pallas_fused.py).
    hashloop = (
        (hashloop_req or _ABLATE == "hashloop") and mpack and cchunk <= 0
    )
    if not hashloop:
        compute_hash_rows(0, n_vert)

    # ---- PT assembly + matmul + select, raw rows t in [-1, band+2) ---------
    # ONE patch block of patch_size+1 rows serves BOTH row phases: the taps
    # of phase r0 sit at sublane offset r0 inside each block (set up in the
    # f_phase layout below), so base row q = 2*(kb+b) covers raw rows q-2
    # (r0=0) and q-1 (r0=1) with a single staged copy set — halving the PT
    # assembly traffic vs one assembly per row phase.
    n = rowbatch * w2p
    n_blocks = patch_size + 1
    rows_blk = patch_size + 1  # 11 taps + 1 row of r0-phase slack
    # ftrans: F operand stored K-major ([K, M] with dims ((0,),(0,))) —
    # experiment for MXU feed efficiency (NOTES r2 lever 1b)
    dims = (((0,), (0,)), ((), ())) if ftrans else (((1,), (0,)), ((), ()))

    if mpack:
        # dense layout: blocks of 12 rows back-to-back (no zero tap-pad
        # rows: K = 12 * 12 = 144 per precision slot vs 192 blocked) and
        # ALL FOUR phases M-packed into one [864, K] filter operand —
        # ~25% less MXU contraction work and 864 rows tile the MXU's
        # 128-row granularity at 96% (4x224-padded-to-256 is 87.5%).
        k_dim = n_blocks * rows_blk
        n_q = tb2 + 2
        f_ref = fs[0]
        for kb in range(0, n_q, rowbatch):
            pt_ref = pt_refs[(kb // rowbatch) % len(pt_refs)]
            for b in range(rowbatch) if _ABLATE != "nocopy" else ():
                q = 2 * (kb + b)
                for j in range(n_blocks):
                    parity = (j + 1) % 2
                    off = (j + 1) // 2
                    plane = ce_s if parity == 0 else co_s
                    pt_ref[
                        j * rows_blk : (j + 1) * rows_blk,
                        b * w2p : (b + 1) * w2p,
                    ] = plane[q : q + rows_blk, off : off + w2p]
                    if need_lo:
                        # lo plane K-slot: 3rd slot for mxu3 ([Fhi,Flo,Fhi] x
                        # [Phi,Phi,Plo]); 2nd slot for the p_split fast tier
                        # ([F',F'] x [Phi,Plo] — F' error-diffused, P exact)
                        lo_base = (2 if mxu_passes >= 3 else 1) * k_dim
                        planel = cel_s if parity == 0 else col_s
                        pt_ref[
                            lo_base + j * rows_blk : lo_base + (j + 1) * rows_blk,
                            b * w2p : (b + 1) * w2p,
                        ] = planel[q : q + rows_blk, off : off + w2p]
            if mxu_passes >= 2 and not p_split and not i8:
                pt_ref[k_dim : 2 * k_dim, :] = pt_ref[0:k_dim, :]
            if i8:
                # bulk aligned cast of the assembled bf16 PT (8-bit content:
                # integer values 0..255, exact) to shifted int8. Staging
                # bf16 first keeps the known-good 12-row block writes; the
                # full-buffer cast replaces the mxu2 hi-slot dup copy.
                pt8_ref[...] = (
                    pt_ref[...] - jnp.bfloat16(128.0)
                ).astype(jnp.int8)

            # matmul granularity: gchunk base rows per [864, K] matmul
            # (gt is [864, gchunk*w2p] f32 — or [1728, .] i32 for the int8
            # pair, whose 5760 cap is NOT the 13.3 MB f32 target: it is the
            # measured-working value from the i8 tier's hardware runs,
            # deliberately left where it was benchmarked): the largest divisor of
            # rowbatch keeping gt <= [864, 3840] f32 = 13.3 MB, overridable
            # for A/B sweeps via gchunk_req. Mosaic pins in-flight gt
            # results in scoped VMEM (one per software-pipelined matmul),
            # so the cap sets the kernel's VMEM high-water mark: the old
            # 11520-col target overran the 124 MB scoped limit by 3.6 MB at
            # the 8K-wide geometry (w2p=3840, auto gchunk=2). At 4K this
            # picks gchunk=2 — also the same-day-measured fastest (9.787
            # ms/pass vs auto(6) 9.997, gchunk=1 9.990; round-4 kbench).
            gchunk = gchunk_req if gchunk_req > 0 else max(
                d for d in range(1, rowbatch + 1)
                if rowbatch % d == 0
                and (d == 1 or d * w2p <= (5760 if i8 else 3840))
            )
            for g0_ in range(0, rowbatch, gchunk):
                gb = min(gchunk, rowbatch - g0_)
                cols = slice(g0_ * w2p, (g0_ + gb) * w2p)
                if i8:
                    # int8 pair: one M-stacked [2*4*NB, k_dim] int8 matmul
                    # at 2x MXU rate = half the mxu2 contraction time;
                    # exact int32 combine (|Fq.P| <= 121*32767*255 < 2^31)
                    gt2 = lax.dot_general(
                        f_ref[...], pt8_ref[:, cols], dims,
                        preferred_element_type=jnp.int32,
                    )
                    if hashloop and g0_ == 0:
                        # this group's hash rows, issued after the dot so the
                        # VPU work can run under the in-flight MXU op
                        compute_hash_rows(
                            2 * kb, min(2 * (kb + rowbatch), n_vert)
                        )
                    gt_all = (
                        gt2[0 : 4 * NB, :] * 256
                        + gt2[4 * NB : 8 * NB, :]
                        + bias_ref[...][:, 0:1]
                    ).astype(jnp.float32)
                else:
                    gt_all = lax.dot_general(
                        f_ref[...], pt_ref[:, cols], dims,
                        preferred_element_type=jnp.float32,
                    )
                    if hashloop and g0_ == 0:
                        compute_hash_rows(
                            2 * kb, min(2 * (kb + rowbatch), n_vert)
                        )
                    if pcenter:
                        gt_all = gt_all + pbias_ref[...][:, 0:1]
                for b in range(g0_, g0_ + gb):
                    bc = slice((b - g0_) * w2p, (b - g0_ + 1) * w2p)
                    for r0 in range(2):
                        for c0 in range(2):
                            p = 2 * r0 + c0
                            row = max(2 * (kb + b) + r0 - 1, 0)
                            idx = bkt_scr[c0][row : row + 1, :]
                            sel = _tree_select(
                                gt_all[p * NB : (p + 1) * NB, bc], idx
                            )
                            if i8:
                                # fixed-point descale (uniform across
                                # buckets, so post-select is exact)
                                sel = sel * inv_ref[0]
                            rr = 2 * (kb + b) + r0
                            raw_scr[c0][rr : rr + 1, :] = sel
    k_dim = n_blocks * BLOCK
    if not mpack:
        zpad = jnp.zeros((BLOCK - rows_blk, n), jnp.bfloat16)
        for pt_ref in pt_refs:
            for blk in range(mxu_passes):
                for j in range(n_blocks):
                    pt_ref[
                        blk * k_dim + j * BLOCK + rows_blk : blk * k_dim + (j + 1) * BLOCK, :
                    ] = zpad

    n_q = tb2 + 2  # base rows; each serves r0 = 0 and 1
    for kb in [] if mpack else range(0, n_q, rowbatch):
        # alternate PT buffers so this group's assembly (VPU) can overlap
        # the previous group's matmuls (MXU) in Mosaic's schedule
        pt_ref = pt_refs[(kb // rowbatch) % len(pt_refs)]
        for b in range(rowbatch) if _ABLATE != "nocopy" else ():
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
                if need_lo:
                    lo_base = (2 if mxu_passes >= 3 else 1) * k_dim
                    planel = cel_s if parity == 0 else col_s
                    pt_ref[
                        lo_base + j * BLOCK : lo_base + j * BLOCK + rows_blk,
                        b * w2p : (b + 1) * w2p,
                    ] = planel[q : q + rows_blk, off : off + w2p]

        if mxu_passes >= 2 and not p_split:
            # duplicate the hi patch block for the K-packed lo filters in
            # one bulk scratch-to-scratch copy instead of per-block writes
            pt_ref[k_dim : 2 * k_dim, :] = pt_ref[0:k_dim, :]

        for r0 in range(2):
            for c0 in range(2):
                f_ref = fs[2 * r0 + c0]
                if cchunk > 0:
                    # column-chunked matmul+select: each unrolled iteration
                    # pairs one MXU op with one select, so Mosaic's
                    # software pipelining overlaps select(c-1) with
                    # matmul(c) (whole-PT matmuls leave the VPU select
                    # serialized behind the MXU)
                    for b in range(rowbatch):
                        row = max(2 * (kb + b) + r0 - 1, 0)
                        rr = 2 * (kb + b) + r0
                        for sub in range(0, w2p, cchunk):
                            cols = slice(b * w2p + sub, b * w2p + sub + cchunk)
                            gt = lax.dot_general(
                                f_ref[...], pt_ref[:, cols], dims,
                                preferred_element_type=jnp.float32,
                            )
                            idx = bkt_scr[c0][row : row + 1, sub : sub + cchunk]
                            sel = _tree_select(gt, idx)
                            raw_scr[c0][rr : rr + 1, sub : sub + cchunk] = sel
                    continue
                if _ABLATE == "nomxu":
                    gt = pt_ref[0:NB, :].astype(jnp.float32)
                else:
                    gt = lax.dot_general(
                        f_ref[...], pt_ref[...], dims, preferred_element_type=jnp.float32
                    )
                # bucket row for raw row t = 2*(kb+b)+r0-2: vert index t+1
                idx = jnp.concatenate(
                    [
                        bkt_scr[c0][
                            max(2 * (kb + b) + r0 - 1, 0) : max(2 * (kb + b) + r0 - 1, 0) + 1, :
                        ]
                        for b in range(rowbatch)
                    ],
                    axis=1,
                )
                if _ABLATE == "noselect":
                    sel = gt[0:1, :] + idx.astype(jnp.float32)
                else:
                    sel = _tree_select(gt, idx)
                for b in range(rowbatch):
                    # raw scratch row = t + 2 = 2*(kb+b) + r0
                    rr = 2 * (kb + b) + r0
                    raw_scr[c0][rr : rr + 1, :] = sel[:, b * w2p : (b + 1) * w2p]

    # ---- epilogue: reject + zone masks + census blend + rounding ------------
    i_band = pl.program_id(0)
    # global full row of band row 0: row0 offsets all zone tests when the
    # plane is a halo-extended stripe of a larger frame (row-sharded mode)
    g0 = i_band * band + row0_ref[0]

    def frame_row(rows):
        """Map a global row to its per-frame row coordinate.

        frame_h == 0: the plane is one frame — identity. Otherwise the plane
        is a vertical stack of frame_h-row frames separated by 2*frame_pad
        replicate-padded guard rows (batched engine mode): guard rows map
        outside [0, frame_h) and fail every zone test, giving each stacked
        frame exactly the single-frame zone semantics."""
        if frame_h <= 0:
            return rows
        period = frame_h + 2 * frame_pad
        return jnp.mod(rows + (period - frame_pad), period)

    eff_h = (zone_h if zone_h > 0 else h_total) if frame_h <= 0 else frame_h
    lane_iota = lax.broadcasted_iota(jnp.int32, (band + 2, w2p), 1)
    row_iota = frame_row(
        lax.broadcasted_iota(jnp.int32, (band + 2, w2p), 0) + (g0 - 1)
    )

    # hr buffer rows t in [-1, band+1): reject-fixed, proc-masked
    hr = {}
    lrx = {}
    for c0, plane in ((0, cf_e), (1, cf_o)):
        lr_ext = plane[6 : 6 + band + 2, 3 : 3 + w2p]  # rows t in [-1, band+1)
        raw_ext = raw_scr[c0][1 : 1 + band + 2, :]
        keep = (raw_ext > float(min_val)) & (raw_ext < float(max_val))
        f_ids = 2 * lane_iota + c0
        proc = (
            (row_iota >= 6)
            & (row_iota < eff_h - 6)
            & (f_ids >= 6)
            & (f_ids < col_end)
        )
        hr[c0] = jnp.where(keep & proc, raw_ext, lr_ext)
        lrx[c0] = lr_ext

    # Precompute the only two non-trivial lane rolls on the full (band+2)-row
    # buffers (Mosaic rejects pltpu.roll on row-offset sub-slices): for even
    # center lanes the left neighbor is the odd plane rolled right; for odd
    # center lanes the right neighbor is the even plane rolled left.
    rolled = {}
    for c0 in range(2):
        for sh in (-1, 0, 1):
            rolled[(c0, sh)] = (
                (_roll(lrx[c0], -sh), _roll(hr[c0], -sh))
                if sh
                else (lrx[c0], hr[c0])
            )

    for c0 in range(2):
        lr_c = lrx[c0][1 : 1 + band, :]  # center rows t in [0, band)
        hr_c = hr[c0][1 : 1 + band, :]
        ham = jnp.zeros((band, w2p), jnp.float32)
        cen = jnp.zeros((band, w2p), jnp.float32)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                if dc == 0:
                    ln = lrx[c0][1 + dr : 1 + dr + band, :]
                    hn = hr[c0][1 + dr : 1 + dr + band, :]
                else:
                    oc = 1 - c0
                    # f+dc has parity oc at plane idx ci + (c0 + dc - oc)//2
                    sh = (c0 + dc - oc) // 2
                    lf, hf = rolled[(oc, sh)]
                    ln = lf[1 + dr : 1 + dr + band, :]
                    hn = hf[1 + dr : 1 + dr + band, :]
                lbit = (ln < lr_c).astype(jnp.float32)
                if blending == 2:
                    hbit = (hn < hr_c).astype(jnp.float32)
                    ham = ham + jnp.abs(lbit - hbit)
                else:
                    cen = cen + lbit

        if blending == 2:
            weight = ham * (1.0 / 8.0)
            val = weight * lr_c + (1.0 - weight) * hr_c
        else:
            weight = cen * (1.0 / 8.0)
            val = weight * hr_c + (1.0 - weight) * lr_c
        val = jnp.clip(jnp.floor(val + 0.5), float(min_val), float(max_val))

        # build the center-row iotas directly at [band, w2p] — Mosaic rejects
        # sublane-misaligned row-slices of iota values
        f_ids = 2 * lax.broadcasted_iota(jnp.int32, (band, w2p), 1) + c0
        g_rows = frame_row(
            lax.broadcasted_iota(jnp.int32, (band, w2p), 0) + (g0 + 1)
        )
        if blending == 2:
            zone = (
                (g_rows >= 1)
                & (g_rows < eff_h - 1)
                & (f_ids >= 1)
                & (f_ids < w_total - 1)
            )
        else:
            zone = (
                (g_rows >= 6)
                & (g_rows < eff_h - 6)
                & (f_ids >= 6)
                & (f_ids < col_end)
            )
        out_ref[:, c0 * w2p : (c0 + 1) * w2p] = jnp.where(zone, val, lr_c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k1d", "nf", "qstr", "qcoh", "qangle", "qstrength", "qcoherence",
        "patch_size", "patch_margin", "mxu_passes", "min_val", "max_val",
        "blending", "exact_edges", "tb2", "rowbatch", "cchunk", "gchunk",
        "hashloop", "mpack", "interpret", "frame_h", "frame_pad", "zone_h",
        "p_split", "ftrans", "i8", "pcenter",
    ),
)
def raisr_pass_pallas_full(
    cheap: jnp.ndarray,  # [H, W] f32 (integer-valued)
    filters: jnp.ndarray,  # [864, 128] f32
    k1d: tuple,
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int = 24,
    qstrength: int = 3,
    qcoherence: int = 3,
    patch_size: int = 11,
    patch_margin: int = 5,
    mxu_passes: int = 2,
    min_val: int = 16,
    max_val: int = 235,
    blending: int = 2,
    exact_edges: bool = True,
    tb2: int = 8,
    rowbatch: int = 0,  # phase rows per matmul; 0 = all (tb2 + 2)
    cchunk: int = 0,  # >0: column-chunked matmul+select (chunk lanes)
    gchunk: int = 0,  # >0: base rows per grouped matmul (A/B knob; 0 = auto)
    hashloop: bool = False,  # hash per matmul group (MXU/VPU overlap; see kernel)
    mpack: bool = True,  # dense-K + M-packed single matmul (see kernel)
    interpret: bool = False,
    frame_h: int = 0,  # >0: plane is a guard-banded vertical frame stack
    frame_pad: int = 0,
    row0: jnp.ndarray | None = None,  # traced scalar: global row of row 0
    zone_h: int = 0,  # >0: global frame height for zone tests (stripes)
    p_split: bool = False,  # fast tier for >8-bit: [F',F'] x [Phi,Plo]
    ftrans: bool = False,  # K-major filter operand (mpack path only)
    i8: bool = False,  # int8-pair fixed-point tier (8-bit content only)
    pcenter: float = 0.0,  # >0: center patches at pcenter pre-bf16-cast
) -> jnp.ndarray:
    """One complete RAISR pass (ratio 2), fused end to end.

    row0/zone_h (row-sharded mode): when `cheap` is a halo-extended stripe
    of a taller frame, row0 holds the global frame row of cheap[0] (may be
    traced, e.g. derived from lax.axis_index inside shard_map — the same
    compiled kernel serves every stripe) and zone_h the global frame height;
    all zone masks then use global coordinates, matching the reference's
    segments running the same hot loop as whole frames (Raisr.cpp:1369-1382).
    """
    from raisr_tpu.ops.pipeline import processed_col_end

    pixel_types = 4
    h, w = cheap.shape
    m = patch_size // 2
    n_taps = patch_size * patch_size
    blk = (patch_size + 1) if mpack else BLOCK
    k_dim = (patch_size + 1) * blk
    band = 2 * tb2
    if rowbatch <= 0:
        if mpack:
            # grouped matmuls: the [864, K] matmul runs per group of base
            # rows with gt kept ~<= [864, 11520] f32 in VMEM (measured
            # fastest: 10.3 ms/pass vs 11.3 per-row at 4K)
            w2p_est = _pad_to(-(-w // 2), 128)
            target = max(1, 11520 // w2p_est)
            rowbatch = max(
                d for d in range(1, tb2 + 3)
                if (tb2 + 2) % d == 0 and d <= target
            )
        else:
            rowbatch = tb2 + 2  # one matmul per (r0, c0), rows [-1, band+2)
    if (tb2 + 2) % rowbatch:
        raise ValueError("rowbatch must divide tb2 + 2")

    h2 = -(-h // 2)
    w2 = -(-w // 2)
    h2p = _pad_to(h2, tb2)
    w2p = _pad_to(w2, 128)
    plane_w = w2p + 128

    n_tiles = h2p // tb2
    top = m + 2  # raw halo rows need tensor rows -6 and their gradients
    bottom = (n_tiles + 1) * band - (h + top)
    left = m + 1
    right = 2 * plane_w - w - left

    padded = jnp.pad(cheap, ((top, bottom), (left, right)))
    planes = [padded[:, 0::2], padded[:, 1::2]]
    # 10/16-bit low-order planes are derived in-kernel from the f32 staging

    if i8:
        # int8-pair fixed-point tier (8-bit content): filters on an int16
        # grid (power-of-2 scale, error-diffused rounding), split balanced
        # into hi/lo int8 and M-stacked; patches are exact in int8 after a
        # -128 shift. v5e runs int8 MXU at 2x the bf16 rate, so the single
        # [2*4*NB, 144] int8 matmul costs one mxu1 slot — half of mxu2 —
        # at near-f32 grade (max +-1 output LSB even on adversarial random
        # patches, inside the reference's own AVX2<->AVX512 ISA spread).
        if not mpack or p_split or ftrans:
            raise ValueError("i8 requires the mpack layout (no p_split/ftrans)")
        mxu_passes = 1  # one K slot: staging/scratch sized like the bf16 tier

    if pcenter and (not mpack or i8 or ftrans):
        raise ValueError("pcenter requires the mpack layout (non-i8)")

    f_all = filters[:, :n_taps].reshape(NB, pixel_types, patch_size, patch_size)
    if (mxu_passes == 1 or p_split) and not i8:
        f_all = _round_bf16_error_diffused(
            f_all.reshape(NB, pixel_types, n_taps)
        ).reshape(NB, pixel_types, patch_size, patch_size)
    if i8:
        # balanced hi/lo int8 pairs span [-32896, 32639]
        absmax = jnp.maximum(jnp.max(jnp.abs(f_all)), 1e-6)
        i8_scale = jnp.exp2(jnp.floor(jnp.log2(32639.0 / absmax)))
        f_all = _round_int_error_diffused(
            f_all.reshape(NB, pixel_types, n_taps), i8_scale
        ).reshape(NB, pixel_types, patch_size, patch_size)
    n_blocks = patch_size + 1
    f_phase = []
    pbias_rows = []
    for r0, c0 in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        pt_idx = ((r0 - patch_margin) % 2) * 2 + ((c0 - patch_margin) % 2)
        fp = jnp.zeros((NB, n_blocks, blk), jnp.float32)
        # taps at block offset c0 (patch column) and sublane offset r0
        # (patch row): both row phases then share ONE staged patch matrix
        # whose blocks hold patch_size+1 consecutive plane rows
        fp = fp.at[:NB, c0 : c0 + patch_size, r0 : r0 + patch_size].set(
            jnp.transpose(f_all[:, pt_idx], (0, 2, 1))
        )
        if i8:
            f_phase.append(fp.reshape(NB, k_dim))  # int16-grid values, f32
            continue
        fhi, flo = _split_hi_lo(fp.reshape(NB, k_dim))
        # p_split (fast tier for >8-bit content): [F', F'] against
        # [Phi, Plo] — the error-diffused F' carries all filter precision,
        # the two P slots make the patch values exact
        parts = [fhi, fhi] if p_split else [fhi, flo, fhi][:mxu_passes]
        f_phase.append(jnp.concatenate(parts, axis=1))
        if pcenter:
            # rowsum of the filters that multiply the CENTERED patch value
            # (P - pcenter): the hi slot always; the lo-filter slot also
            # rides Phi when present (mxu>=2 non-p_split). gt then gains
            # pcenter * rowsum back so raw values keep the original scale.
            fb = fhi.astype(jnp.float32)
            if mxu_passes >= 2 and not p_split:
                fb = fb + flo.astype(jnp.float32)
            pbias_rows.append(float(pcenter) * jnp.sum(fb, axis=1))
    if mpack:
        f_phase = [jnp.concatenate(f_phase, axis=0)]  # [4 * NB, mxu * 144]
        if ftrans:
            f_phase = [f_phase[0].T]  # [mxu * 144, 4 * NB] K-major
    i8_extra = []
    if i8:
        fq = f_phase[0]  # [4 * NB, k_dim], values on the int16 grid
        f_lo = jnp.mod(fq + 128.0, 256.0) - 128.0
        f_hi = (fq - f_lo) * (1.0 / 256.0)
        f_phase = [
            jnp.concatenate([f_hi, f_lo], axis=0).astype(jnp.int8)
        ]  # [8 * NB, k_dim]
        # bias undoes the -128 patch shift: Fq @ P = Fq @ (P-128) + bias.
        # rowsum <= 121 * 32767 < 2^24 so the f32 sum is exact; * 128
        # only shifts the exponent.
        bias = (128.0 * jnp.sum(fq, axis=1)).astype(jnp.int32)
        i8_extra = [
            jnp.tile(bias[:, None], (1, 128)),  # lane-replicated [4*NB, 128]
            (1.0 / i8_scale).astype(jnp.float32).reshape(1),  # SMEM scalar
        ]

    plane_spec = pl.BlockSpec(
        (None, band, plane_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (8 * NB, k_dim) if i8
        else (mxu_passes * k_dim, 4 * NB) if (mpack and ftrans)
        else (4 * NB if mpack else NB, mxu_passes * k_dim),
        lambda i: (0, 0), memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (None, band, 2 * w2p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    if cchunk > 0 and (cchunk % 128 or w2p % cchunk):
        raise ValueError("cchunk must be lane-aligned and divide w2p")
    if ftrans and not mpack:
        raise ValueError("ftrans requires the mpack layout")

    kernel = functools.partial(
        _full_kernel,
        tb2=tb2,
        w2p=w2p,
        plane_w=plane_w,
        patch_size=patch_size,
        mxu_passes=mxu_passes,
        cchunk=cchunk,
        gchunk_req=gchunk,
        hashloop_req=hashloop,
        mpack=mpack,
        band=band,
        rowbatch=rowbatch,
        k1d=k1d,
        nf=nf,
        qstr=qstr,
        qcoh=qcoh,
        qangle=qangle,
        qstrength=qstrength,
        qcoherence=qcoherence,
        h_total=h,
        w_total=w,
        min_val=min_val,
        max_val=max_val,
        blending=blending,
        col_end=processed_col_end(w, m + 1, exact_edges),
        frame_h=frame_h,
        frame_pad=frame_pad,
        zone_h=zone_h,
        p_split=p_split,
        ftrans=ftrans,
        i8=i8,
        pcenter=float(pcenter),
    )
    scratch = [pltpu.VMEM((band + 16, plane_w), jnp.float32) for _ in range(2)]
    n_stage = 4 if (mxu_passes >= 3 or p_split) else 2
    scratch += [pltpu.VMEM((band + 16, plane_w), jnp.bfloat16) for _ in range(n_stage)]
    scratch += [pltpu.VMEM((band + 8, w2p), jnp.int32) for _ in range(2)]
    scratch += [pltpu.VMEM((band + 8, w2p), jnp.float32) for _ in range(2)]
    if i8:
        scratch += [pltpu.VMEM((k_dim, rowbatch * w2p), jnp.int8)]
    n_pt = 1 if rowbatch >= tb2 + 2 else 2  # double-buffer multi-group runs
    scratch += [
        pltpu.VMEM((mxu_passes * k_dim, rowbatch * w2p), jnp.bfloat16)
        for _ in range(n_pt)
    ]

    plane_specs = []
    plane_args = []
    for pln in planes:
        plane_specs.extend([plane_spec, plane_spec])
        plane_args.append(pln[: n_tiles * band].reshape(n_tiles, band, plane_w))
        plane_args.append(
            pln[band : (n_tiles + 1) * band].reshape(n_tiles, band, plane_w)
        )
    row0_arr = jnp.asarray(
        0 if row0 is None else row0, jnp.int32
    ).reshape(1)
    row0_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    i8_specs = []
    if i8:
        i8_specs = [
            pl.BlockSpec(
                (4 * NB, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    pc_extra = []
    if pcenter:
        pb = jnp.concatenate(pbias_rows, axis=0)  # [4 * NB]
        pc_extra = [jnp.tile(pb[:, None], (1, 128)).astype(jnp.float32)]
        i8_specs = [
            pl.BlockSpec(
                (4 * NB, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=plane_specs + [f_spec] * len(f_phase) + i8_specs + [row0_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, band, 2 * w2p), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, *f_phase, *i8_extra, *pc_extra, row0_arr)
    out = out.reshape(2 * h2p, 2 * w2p)

    oute = out[:, :w2p]
    outo = out[:, w2p : 2 * w2p]
    full = jnp.stack([oute, outo], axis=2).reshape(2 * h2p, 2 * w2p)
    return full[:h, :w]


# ---------------------------------------------------------------------------
# single-phase (pixel_types == 1, e.g. ratio 1.5) whole-pass kernel
# ---------------------------------------------------------------------------


def _full_kernel_single(
    *refs,
    wp: int,
    plane_w: int,
    patch_size: int,
    mxu_passes: int,
    band: int,
    ostack: int,
    k1d: tuple,
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int,
    qstrength: int,
    qcoherence: int,
    h_total: int,
    w_total: int,
    min_val: int,
    max_val: int,
    blending: int,
    col_end: int,
    frame_h: int,
    frame_pad: int,
    zone_h: int,
    p_split: bool,
):
    """Whole RAISR pass for single-phase banks: stride-1 output rows.

    One staged 16-sublane block of consecutive plane rows serves
    SHARE = 16 - patch_size + 1 (= 6) consecutive output rows — the filter
    copy for output-row offset o carries its taps at sublane offset o — and
    all `ostack` offsets of a group ride one stacked-F matmul."""
    from raisr_tpu.ops.hashing import atan2_approx

    share = BLOCK - patch_size + 1

    def _roll(x, shift):
        return pltpu.roll(x, shift % x.shape[1], axis=1)

    it = iter(refs)
    has_lo = mxu_passes >= 3 or p_split
    ca, cb = next(it), next(it)
    if has_lo:
        cla, clb = next(it), next(it)
    n_f = -(-share // ostack)
    fs = tuple(next(it) for _ in range(n_f))
    row0_ref = next(it)  # SMEM [1] int32: global row of plane row 0 (stripes)
    out_ref = next(it)  # [band, wp]
    cf = next(it)  # f32 staging [band + 16, plane_w]
    c_s = next(it)  # bf16 staging
    if has_lo:
        cl_s = next(it)
    bkt_scr = next(it)  # int32 [band + 8, wp]
    raw_scr = next(it)  # f32 [band + 8, wp]
    pt_ref = next(it)  # bf16 [mxu * 11 * 16, wp]

    # ---- stage (local plane row l <-> full row band*i - 7 + l) -------------
    cf[0:band, :] = ca[...]
    cf[band : band + 16, :] = cb[0:16, :]
    c_s[...] = cf[...].astype(jnp.bfloat16)
    if has_lo:
        cl_s[0:band, :] = cla[...].astype(jnp.bfloat16)
        cl_s[band : band + 16, :] = clb[0:16, :].astype(jnp.bfloat16)

    # ---- gradients ----------------------------------------------------------
    rows_g = band + 14  # gradient at local row j+1 for j in [0, rows_g)
    P = cf[0 : rows_g + 2, :]
    gx = P[2:, :] - P[:-2, :]
    Pm = P[1:-1, :]
    gy = _roll(Pm, -1) - _roll(Pm, 1)

    # ---- separable structure tensor -----------------------------------------
    n_vert = band + 3  # tensor rows for raw rows t in [-1, band+2)
    nk = len(k1d)
    # pairing off by default — see the 4-phase kernel's measured A/B (FMA
    # makes the unpaired chain at least as fast); RAISR_ABLATE=pair opts in
    k_sym = (
        all(k1d[i] == k1d[nk - 1 - i] for i in range(nk))
        and _ABLATE == "pair"
    )

    def vert(mp):
        if not k_sym:
            acc = None
            for i, kv in enumerate(k1d):
                t = mp[i : i + n_vert, :] * kv
                acc = t if acc is None else acc + t
            return acc
        acc = None
        for i in range(nk // 2):
            i2 = nk - 1 - i
            t = (mp[i : i + n_vert, :] + mp[i2 : i2 + n_vert, :]) * k1d[i]
            acc = t if acc is None else acc + t
        mid = nk // 2
        return acc + mp[mid : mid + n_vert, :] * k1d[mid]

    va, vb_, vd = vert(gx * gx), vert(gx * gy), vert(gy * gy)

    def horiz(vm):
        if not k_sym:
            acc = None
            for j, kv in enumerate(k1d):
                t = _roll(vm, 5 - j) * kv
                acc = t if acc is None else acc + t
            return acc * nf
        acc = None
        for j in range(nk // 2):
            t = (_roll(vm, 5 - j) + _roll(vm, j - 5)) * k1d[j]
            acc = t if acc is None else acc + t
        return (acc + vm * k1d[nk // 2]) * nf

    a = horiz(va)[:, 6 : 6 + wp]
    b = horiz(vb_)[:, 6 : 6 + wp]
    d = horiz(vd)[:, 6 : 6 + wp]

    # ---- hash ---------------------------------------------------------------
    t_tr = a + d
    det = a * d - b * b
    sqr = jnp.sqrt(jnp.maximum(t_tr * t_tr * 0.25 - det, 0.0))
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
    bkt_scr[0:n_vert, :] = ai * (qstrength * qcoherence) + si * qcoherence + ci

    # ---- PT assembly + stacked-offset matmul + selects ----------------------
    n_blocks = patch_size  # 11 tap-column blocks
    k_dim = n_blocks * BLOCK
    dims = (((1,), (0,)), ((), ()))

    # raw rows t = q + o - 2 (offset o in [0, share)), valid t in [-1, band+2).
    # The staged block base is clamped to `band` so c_s[q : q + BLOCK] never
    # reads past the (band + 16)-row staging buffer (at band = 16 the last
    # unclamped base would be 18 -> rows [18, 34) of a 32-row buffer); the
    # row a clamped iteration covers shifts to offset o = row - q, which
    # stays inside [0, share) because rows only run to band + 3 <= q + 3.
    for q0 in range(0, band + 4, share):
        q = min(q0, band)
        for j in range(n_blocks):
            block = c_s[q : q + BLOCK, j + 1 : j + 1 + wp]
            pt_ref[j * BLOCK : (j + 1) * BLOCK, :] = block
            if p_split:
                # fast tier for >8-bit: slot 2 is the LO plane — PT stays
                # exact as [Phi, Plo] against [F', F'] (cf. the 4-phase
                # kernel's p_split)
                pt_ref[k_dim + j * BLOCK : k_dim + (j + 1) * BLOCK, :] = (
                    cl_s[q : q + BLOCK, j + 1 : j + 1 + wp]
                )
            elif mxu_passes >= 2:
                pt_ref[k_dim + j * BLOCK : k_dim + (j + 1) * BLOCK, :] = block
            if mxu_passes >= 3:
                pt_ref[2 * k_dim + j * BLOCK : 2 * k_dim + (j + 1) * BLOCK, :] = (
                    cl_s[q : q + BLOCK, j + 1 : j + 1 + wp]
                )

        for g_i in range(n_f):
            o_lo = g_i * ostack
            o_hi = min(o_lo + ostack, share)
            valid = [
                o
                for o in range(o_lo, o_hi)
                if max(q0, 1) <= q + o < band + 4
            ]
            if not valid:
                continue
            gt = lax.dot_general(
                fs[g_i][...], pt_ref[...], dims,
                preferred_element_type=jnp.float32,
            )
            for o in valid:
                o_rel = o - o_lo
                idx = bkt_scr[max(q + o - 1, 0) : max(q + o - 1, 0) + 1, :]
                sel = _tree_select(gt[o_rel * NB : (o_rel + 1) * NB, :], idx)
                raw_scr[q + o : q + o + 1, :] = sel

    # ---- epilogue: reject + zone masks + census blend + rounding ------------
    i_band = pl.program_id(0)
    g0 = i_band * band + row0_ref[0]  # global row (stripes: row0 offset)

    def frame_row(rows):
        if frame_h <= 0:
            return rows
        period = frame_h + 2 * frame_pad
        return jnp.mod(rows + (period - frame_pad), period)

    eff_h = (zone_h if zone_h > 0 else h_total) if frame_h <= 0 else frame_h
    lane_iota = lax.broadcasted_iota(jnp.int32, (band + 2, wp), 1)
    row_iota = frame_row(
        lax.broadcasted_iota(jnp.int32, (band + 2, wp), 0) + (g0 - 1)
    )

    lr_ext = cf[6 : 6 + band + 2, 6 : 6 + wp]  # rows t in [-1, band+1)
    raw_ext = raw_scr[1 : 1 + band + 2, :]
    keep = (raw_ext > float(min_val)) & (raw_ext < float(max_val))
    proc = (
        (row_iota >= 6)
        & (row_iota < eff_h - 6)
        & (lane_iota >= 6)
        & (lane_iota < col_end)
    )
    hr_ext = jnp.where(keep & proc, raw_ext, lr_ext)

    rolled = {}
    for sh in (-1, 0, 1):
        rolled[sh] = (
            (_roll(lr_ext, sh), _roll(hr_ext, sh)) if sh else (lr_ext, hr_ext)
        )

    lr_c = lr_ext[1 : 1 + band, :]
    hr_c = hr_ext[1 : 1 + band, :]
    ham = jnp.zeros((band, wp), jnp.float32)
    cen = jnp.zeros((band, wp), jnp.float32)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            lf, hf = rolled[dc]
            ln = lf[1 + dr : 1 + dr + band, :]
            hn = hf[1 + dr : 1 + dr + band, :]
            lbit = (ln < lr_c).astype(jnp.float32)
            if blending == 2:
                hbit = (hn < hr_c).astype(jnp.float32)
                ham = ham + jnp.abs(lbit - hbit)
            else:
                cen = cen + lbit

    if blending == 2:
        weight = ham * (1.0 / 8.0)
        val = weight * lr_c + (1.0 - weight) * hr_c
    else:
        weight = cen * (1.0 / 8.0)
        val = weight * hr_c + (1.0 - weight) * lr_c
    val = jnp.clip(jnp.floor(val + 0.5), float(min_val), float(max_val))

    c_ids = lax.broadcasted_iota(jnp.int32, (band, wp), 1)
    g_rows = frame_row(
        lax.broadcasted_iota(jnp.int32, (band, wp), 0) + (g0 + 1)
    )
    if blending == 2:
        zone = (
            (g_rows >= 1)
            & (g_rows < eff_h - 1)
            & (c_ids >= 1)
            & (c_ids < w_total - 1)
        )
    else:
        zone = (
            (g_rows >= 6)
            & (g_rows < eff_h - 6)
            & (c_ids >= 6)
            & (c_ids < col_end)
        )
    out_ref[...] = jnp.where(zone, val, lr_c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k1d", "nf", "qstr", "qcoh", "qangle", "qstrength", "qcoherence",
        "patch_size", "mxu_passes", "min_val", "max_val",
        "blending", "exact_edges", "tb2", "ostack", "interpret",
        "frame_h", "frame_pad", "zone_h", "p_split",
    ),
)
def raisr_pass_pallas_full_single(
    cheap: jnp.ndarray,  # [H, W] f32 (integer-valued)
    filters: jnp.ndarray,  # [216, 128] f32 (pixel_types == 1)
    k1d: tuple,
    nf: float,
    qstr: tuple,
    qcoh: tuple,
    qangle: int = 24,
    qstrength: int = 3,
    qcoherence: int = 3,
    patch_size: int = 11,
    mxu_passes: int = 2,
    min_val: int = 16,
    max_val: int = 235,
    blending: int = 2,
    exact_edges: bool = True,
    tb2: int = 16,
    ostack: int = 3,  # row offsets stacked per matmul (divides/covers 6)
    interpret: bool = False,
    frame_h: int = 0,
    frame_pad: int = 0,
    row0: jnp.ndarray | None = None,  # traced scalar: global row of row 0
    zone_h: int = 0,  # >0: global frame height for zone tests (stripes)
    p_split: bool = False,  # fast tier for >8-bit: [F',F'] x [Phi,Plo]
) -> jnp.ndarray:
    """One complete RAISR pass for single-phase filter banks (ratio != 2,
    reference gUsePixelType == false, Raisr.cpp:1477-1480), fused end to end."""
    from raisr_tpu.ops.pipeline import processed_col_end

    h, w = cheap.shape
    m = patch_size // 2
    n_taps = patch_size * patch_size
    share = BLOCK - patch_size + 1
    k_dim = patch_size * BLOCK
    band = 2 * tb2

    hp = _pad_to(h, band)
    wp = _pad_to(w, 128)
    plane_w = wp + 128

    n_tiles = hp // band
    top = m + 2
    bottom = (n_tiles + 1) * band - (h + top)
    left = m + 1
    right = plane_w - w - left

    if p_split and mxu_passes != 2:
        raise ValueError("single-phase p_split uses exactly 2 K slots")

    padded = jnp.pad(cheap, ((top, bottom), (left, right)))
    planes = [padded]
    if mxu_passes >= 3 or p_split:
        planes.append(padded - _round_bf16(padded))

    f_all = filters[:, :n_taps].reshape(NB, patch_size, patch_size)
    if mxu_passes == 1 or p_split:
        f_all = _round_bf16_error_diffused(
            f_all.reshape(NB, n_taps)
        ).reshape(NB, patch_size, patch_size)
    n_f = -(-share // ostack)
    f_groups = []
    for g_i in range(n_f):
        parts = []
        for o in range(g_i * ostack, min((g_i + 1) * ostack, share)):
            fp = jnp.zeros((NB, patch_size, BLOCK), jnp.float32)
            fp = fp.at[:NB, :, o : o + patch_size].set(
                jnp.transpose(f_all, (0, 2, 1))
            )
            fhi, flo = _split_hi_lo(fp.reshape(NB, k_dim))
            # p_split: [F', F'] against [Phi, Plo] — the error-diffused F'
            # carries all filter precision, the two P slots keep >8-bit
            # patch values exact (cf. the 4-phase kernel's p_split)
            slots = [fhi, fhi] if p_split else [fhi, flo, fhi][:mxu_passes]
            parts.append(jnp.concatenate(slots, axis=1))
        f_groups.append(jnp.concatenate(parts, axis=0))

    plane_spec = pl.BlockSpec(
        (None, band, plane_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (None, band, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _full_kernel_single,
        wp=wp,
        plane_w=plane_w,
        patch_size=patch_size,
        mxu_passes=mxu_passes,
        band=band,
        ostack=ostack,
        k1d=k1d,
        nf=nf,
        qstr=qstr,
        qcoh=qcoh,
        qangle=qangle,
        qstrength=qstrength,
        qcoherence=qcoherence,
        h_total=h,
        w_total=w,
        min_val=min_val,
        max_val=max_val,
        blending=blending,
        col_end=processed_col_end(w, m + 1, exact_edges),
        frame_h=frame_h,
        frame_pad=frame_pad,
        zone_h=zone_h,
        p_split=p_split,
    )
    scratch = [pltpu.VMEM((band + 16, plane_w), jnp.float32)]
    n_stage = 1 if (mxu_passes < 3 and not p_split) else 2
    scratch += [pltpu.VMEM((band + 16, plane_w), jnp.bfloat16) for _ in range(n_stage)]
    scratch.append(pltpu.VMEM((band + 8, wp), jnp.int32))
    scratch.append(pltpu.VMEM((band + 8, wp), jnp.float32))
    scratch.append(pltpu.VMEM((mxu_passes * k_dim, wp), jnp.bfloat16))

    plane_specs = []
    plane_args = []
    for pln in planes:
        plane_specs.extend([plane_spec, plane_spec])
        plane_args.append(pln[: n_tiles * band].reshape(n_tiles, band, plane_w))
        plane_args.append(
            pln[band : (n_tiles + 1) * band].reshape(n_tiles, band, plane_w)
        )
    f_specs = [
        pl.BlockSpec(f.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for f in f_groups
    ]
    row0_arr = jnp.asarray(
        0 if row0 is None else row0, jnp.int32
    ).reshape(1)
    row0_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=plane_specs + f_specs + [row0_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, band, wp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*plane_args, *f_groups, row0_arr)
    return out.reshape(hp, wp)[:h, :w]
