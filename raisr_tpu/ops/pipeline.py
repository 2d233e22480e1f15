"""Whole-frame functional RAISR pipeline (one pass, and the pass loop).

This is the TPU-native replacement for the reference's per-segment hot loop
(processSegment, reference: Library/Raisr.cpp:890-1289): instead of a thread
pool slicing the frame into halo-expanded row segments with spin-wait
barriers, each pass is a pure function over the whole plane; XLA fuses the
stages and the inter-pass barrier is dataflow.

Full-frame zone semantics (derived from the reference's segment planning,
RNLSetRes Raisr.cpp:1742-1779, and hot-loop bounds Raisr.cpp:1038-1066):
  - RAISR-processed zone: rows [6, H-6), cols [6, col_end), where with
    exact_edges col_end replicates the AVX-512 unrolled loop's ragged right
    edge (8-aligned, first iteration needs 16 columns: Raisr.cpp:1066,1247).
  - Randomness blending happens only on processed pixels (Raisr.cpp:1203-1242).
  - CountOfBitsChanged blending zone: rows [1, H-1) x cols [1, W-1)
    (CTmargin; Raisr.cpp:1758-1759, 719), with HR = cheap outside the
    processed zone.
  - Everything else: cheap-upscaled pixels pass through unrounded/unclamped
    (border memcpys, Raisr.cpp:998-1028, 1252-1265).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig, BlendingMode, CT_MARGIN
from raisr_tpu.model.gaussian import gaussian_weights
from raisr_tpu.model.loader import RaisrModel
from raisr_tpu.ops import census, hashing
from raisr_tpu.ops.filter_apply import apply_filters_taps, apply_filters_conv
from raisr_tpu.ops.resize import cheap_upscale, cheap_upscale_stacked


@dataclasses.dataclass(frozen=True)
class PassStatics:
    """Static (hashable) parameters of one RAISR pass."""

    qangle: int
    qstrength: int
    qcoherence: int
    patch_size: int
    pixel_types: int
    use_pixel_type: bool
    ratio_int: int
    bits: int
    min_val: int
    max_val: int
    blending: int
    exact_edges: bool
    backend: str  # "taps" | "conv" | "pallas"
    # MXU passes for the fused kernel: 1 = pure bf16 (the AVX512-FP16
    # analogue), 2 = f32-grade for 8-bit content, 3 = f32-grade for 10/16-bit
    mxu_passes: int = 2
    # per-pass (qstr, qcoh) bin edges as python floats: the fully-fused
    # pallas kernel bakes them as compile-time constants
    bank_edges: tuple = ()
    # run pallas kernels in interpret mode (CPU-mesh tests of sharded paths)
    backend_interpret: bool = False
    # >8-bit fast tier: [F',F'] x [Phi,Plo] (error-diffused F', exact P) —
    # mxu2 cost with bf16-tier quality semantics (full_kernel.py p_split)
    p_split: bool = False
    # int8-pair fixed-point tier (8-bit content): hi/lo int8 filters on the
    # MXU's 2x int8 path, exact shifted-int8 patches (full_kernel.py i8)
    i8: bool = False
    # >0: 10-bit single-slot fast tier — patches centered at pcenter before
    # the bf16 staging cast (halves the rounding error; values within
    # +-256 of center become exact) with pcenter*rowsum(F) added back
    # post-matmul (full_kernel.py pcenter). mxu1 cost for >8-bit content.
    pcenter: float = 0.0
    # cheap-upscale resampler (RaisrConfig.resize_mode); non-bilinear modes
    # use the per-frame vmap batch fallback (no stacked formulation)
    resize_mode: str = "bilinear"

    @property
    def patch_margin(self) -> int:
        return self.patch_size >> 1

    @property
    def loop_margin(self) -> int:
        return (self.patch_size >> 1) + 1


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


def select_fused_tb2(s: "PassStatics", w: int) -> int:
    """Band height for the fused whole-pass kernel, before the plane-height
    clamp (callers min() with their plane/stripe height). ONE definition for
    the unsharded and row-striped paths — these drifted once (round 5: the
    stripe path kept tb2=32 at w>4608, the exact scoped-VMEM OOM geometry).

    Measured schedule (tools/kbench_full.py, same-day sweeps):
    - 40 fastest at 4K for the 2-slot kernels (round 3: mxu2 9.85 ms/pass
      at tb2=40 vs 10.06 at 48 vs 10.7 at 16; mxu1 7.40 vs 7.61; p_split
      9.20 at 40 vs 10.58 at 32). p_split at tb2=48 additionally exceeds
      the 128 MB scoped VMEM (136.9M measured).
    - int8-pair tier: 48 fastest (round-5 sweep: 8.06 ms/pass at tb2=48 vs
      8.22 at 40 vs 8.17 at 40+gchunk2) — its gt matmul output and staged
      planes are int8/int32-packed, so the taller band still fits VMEM.
    - mxu_passes=3 kernels unroll 50% more work per band and Mosaic compile
      time explodes at tb2=48, so 10/16-bit f32-grade stays at tb2=32
      (12.4 ms/pass).
    - Wide (8K-class) outputs need a shorter band: Mosaic's scoped-VMEM
      demand is ~proportional to band_rows x plane_w (measured: the 8K
      geometry at tb2=32 computes 127.63M vs the 124M limit, INDEPENDENT
      of matmul group size — whole-band intermediates, not gt). tb2=24
      puts 8K-wide at ~0.8x that demand; the 3/4-slot kernels carry two
      extra staging planes, so they drop to 16. The i8 tier keeps the
      conservative 24 at 8K (untested taller there)."""
    if w <= 4608:
        if s.i8:
            return 48
        return 40 if s.mxu_passes < 3 else 32
    return 24 if s.mxu_passes < 3 and not s.p_split else 16


def processed_col_end(width: int, loop_margin: int, exact_edges: bool) -> int:
    """Last processed column (exclusive) of the hot loop.

    The reference's AVX-512 loop starts at 16-wide unroll and drops to 8 near
    the edge (Raisr.cpp:1066-1250): columns [6, 6 + 8*floor((W-12)/8)) are
    processed, and nothing at all if fewer than 16 columns fit."""
    if not exact_edges:
        return width - loop_margin
    usable = width - 2 * loop_margin
    if usable < 16:
        return loop_margin
    return loop_margin + 8 * (usable // 8)


def _round_clamp(val: jnp.ndarray, min_val: int, max_val: int) -> jnp.ndarray:
    """floor(val + 0.5) then clamp — the output packing of both blend paths
    (Raisr.cpp:735-745, Raisr_AVX256.cpp:119-123)."""
    return jnp.clip(jnp.floor(val + 0.5), float(min_val), float(max_val))


def raisr_pass(
    cheap: jnp.ndarray,
    filters: jnp.ndarray,
    qstr: jnp.ndarray,
    qcoh: jnp.ndarray,
    statics: PassStatics,
    pass_idx: int = 0,
    frame_h: int = 0,
    frame_pad: int = 0,
) -> jnp.ndarray:
    """One RAISR pass over an integer-valued float32 plane. Returns the
    integer-valued output plane (float32).

    frame_h > 0 (pallas path only): the plane is a vertical stack of
    frame_h-row frames separated by 2*frame_pad guard rows; zone masks are
    applied per frame (batched engine mode, see process_plane_y_batch)."""
    h, w = cheap.shape
    s = statics
    lm = s.loop_margin

    if s.backend == "pallas" and s.use_pixel_type and s.bank_edges:
        # whole pass in one kernel: gradients + structure tensor + hash +
        # filter + reject + census blend + rounding (only the cheap plane
        # and the final output touch HBM)
        from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor
        from raisr_tpu.ops.pallas.full_kernel import raisr_pass_pallas_full

        edges = s.bank_edges[pass_idx]
        return raisr_pass_pallas_full(
            cheap,
            filters,
            k1d=tuple(float(v) for v in gaussian_kernel_1d(s.patch_size)),
            nf=normalization_factor(s.bits),
            qstr=edges[0],
            qcoh=edges[1],
            qangle=s.qangle,
            qstrength=s.qstrength,
            qcoherence=s.qcoherence,
            patch_size=s.patch_size,
            patch_margin=s.patch_margin,
            mxu_passes=s.mxu_passes,
            min_val=s.min_val,
            max_val=s.max_val,
            blending=int(s.blending),
            exact_edges=s.exact_edges,
            # band height: measured schedule, see select_fused_tb2. Clamped
            # by plane height so short planes (test images, short stripes)
            # don't process padding-only band rows.
            tb2=min(select_fused_tb2(s, w), _pad_up(-(-h // 2), 8)),
            frame_h=frame_h,
            frame_pad=frame_pad,
            interpret=s.backend_interpret,
            p_split=s.p_split,
            i8=s.i8,
            pcenter=s.pcenter,
        )

    if (
        s.backend == "pallas"
        and not s.use_pixel_type
        and s.pixel_types == 1
        and s.bank_edges
    ):
        # single-phase whole-pass kernel (ratio != 2 banks, e.g. 1.5x)
        from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor
        from raisr_tpu.ops.pallas.full_kernel import raisr_pass_pallas_full_single

        edges = s.bank_edges[pass_idx]
        return raisr_pass_pallas_full_single(
            cheap,
            filters,
            k1d=tuple(float(v) for v in gaussian_kernel_1d(s.patch_size)),
            nf=normalization_factor(s.bits),
            qstr=edges[0],
            qcoh=edges[1],
            qangle=s.qangle,
            qstrength=s.qstrength,
            qcoherence=s.qcoherence,
            patch_size=s.patch_size,
            mxu_passes=s.mxu_passes,
            p_split=s.p_split,
            min_val=s.min_val,
            max_val=s.max_val,
            blending=int(s.blending),
            exact_edges=s.exact_edges,
            tb2=min(16 if w <= 4608 else 8, _pad_up(-(-h // 2), 4)),
            frame_h=frame_h,
            frame_pad=frame_pad,
            interpret=s.backend_interpret,
        )

    gx, gy = hashing.gradients(cheap)
    if s.backend == "pallas":
        # single-channel 2D convs lower catastrophically on TPU; separable
        # shift-FMA form (same up to the literal table's 6-digit printing)
        from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor

        a, b, d = hashing.structure_tensor_separable(
            gx, gy, gaussian_kernel_1d(s.patch_size), normalization_factor(s.bits)
        )
    else:
        weights = gaussian_weights(s.patch_size, s.bits)
        a, b, d = hashing.structure_tensor(gx, gy, jnp.asarray(weights))
    buckets = hashing.hash_buckets(
        a, b, d, qstr, qcoh, s.qangle, s.qstrength, s.qcoherence
    )
    ptype = hashing.pixel_types(h, w, s.ratio_int, s.patch_margin, s.use_pixel_type)

    if s.backend == "pallas":
        from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas

        raw = apply_filters_pallas(
            cheap,
            buckets,
            filters,
            patch_size=s.patch_size,
            pixel_types=s.pixel_types,
            patch_margin=s.patch_margin,
            ratio=s.ratio_int,
            mxu_passes=s.mxu_passes,
        )
    elif s.backend == "conv":
        raw = apply_filters_conv(
            cheap,
            buckets,
            filters,
            s.patch_size,
            s.pixel_types,
            s.patch_margin,
            s.ratio_int,
        )
    else:
        filter_idx = buckets * s.pixel_types + ptype
        raw = apply_filters_taps(cheap, filter_idx, filters, s.patch_size)

    return _finish_pass(cheap, raw, s)


def _finish_pass(cheap: jnp.ndarray, raw: jnp.ndarray, s: PassStatics) -> jnp.ndarray:
    """Range-reject, CT blend, zone masks, rounding — shared pass epilogue."""
    h, w = cheap.shape
    lm = s.loop_margin
    # Out-of-range reject keeps the cheap pixel (exclusive compare,
    # Raisr.cpp:1196-1201); the rejected value also feeds the CT blend's HR
    # input, because raisr32f starts as a copy of the cheap plane
    # (Raisr.cpp:1029-1036).
    keep = (raw > float(s.min_val)) & (raw < float(s.max_val))
    raisr_px = jnp.where(keep, raw, cheap)

    # Processed-zone mask.
    col_end = processed_col_end(w, lm, s.exact_edges)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    proc = (
        (row_ids >= lm)
        & (row_ids < h - lm)
        & (col_ids >= lm)
        & (col_ids < col_end)
    )

    if s.blending == BlendingMode.RANDOMNESS:
        blended = census.blend_randomness(cheap, raisr_px)
        out = jnp.where(proc, _round_clamp(blended, s.min_val, s.max_val), cheap)
    else:
        hr_buf = jnp.where(proc, raisr_px, cheap)
        blended = census.blend_count_of_bits_changed(cheap, hr_buf)
        blend_zone = (
            (row_ids >= CT_MARGIN)
            & (row_ids < h - CT_MARGIN)
            & (col_ids >= CT_MARGIN)
            & (col_ids < w - CT_MARGIN)
        )
        out = jnp.where(
            blend_zone, _round_clamp(blended, s.min_val, s.max_val), cheap
        )
    return out


def pass_statics(cfg: RaisrConfig, model: RaisrModel, backend: str) -> PassStatics:
    p_split = False
    i8 = False
    pcenter = 0.0
    single_phase = model.banks[0].pixel_types == 1
    if cfg.dtype == "bfloat16":
        # fp16-class fast tier (reference AVX512FP16 analogue): one matmul
        # slot at 8-bit (patches exact in bf16). 10-bit: one slot with
        # patches CENTERED at 512 pre-cast (max rounding error halves; the
        # GT gate passes at -0.017 dB vs the 0.05 bar,
        # tests/test_reference_parity.py) — mxu1 cost. 16-bit (and the
        # single-phase 1.5x kernel, which has no pcenter path): two slots
        # [Phi, Plo] keep patches exact (p_split).
        if cfg.bits == 8:
            mxu_passes = 1
        elif cfg.bits == 10 and not single_phase:
            mxu_passes = 1
            pcenter = 512.0
        else:
            mxu_passes = 2
            p_split = True
    elif cfg.dtype == "bfloat16_exact":
        # exact-patch variant of the fast tier: identical to bfloat16 at
        # 8-bit; at 10/16-bit forces the p_split [F',F'] x [Phi,Plo]
        # packing (mxu2 cost, patch values exact) — the pre-round-5 10-bit
        # default, kept user-reachable for quality-first 10-bit serving
        mxu_passes = 1 if cfg.bits == 8 else 2
        p_split = cfg.bits > 8
    elif cfg.dtype == "int8":
        # int8-pair fixed-point tier: one double-rate int8 matmul slot,
        # quality between the bf16 tier and f32-grade (cfg validates bits==8)
        mxu_passes = 1
        i8 = True
    else:
        mxu_passes = 2 if cfg.bits == 8 else 3
    bank_edges = tuple(
        (tuple(float(v) for v in b.qstr), tuple(float(v) for v in b.qcoh))
        for b in model.banks
    )
    return PassStatics(
        qangle=model.qangle,
        qstrength=model.qstrength,
        qcoherence=model.qcoherence,
        patch_size=model.patch_size,
        pixel_types=model.banks[0].pixel_types,
        use_pixel_type=cfg.use_pixel_type,
        ratio_int=int(cfg.ratio),
        bits=cfg.bits,
        min_val=cfg.min_val,
        max_val=cfg.max_val,
        blending=int(cfg.blending),
        exact_edges=cfg.exact_edges,
        backend=backend,
        mxu_passes=mxu_passes,
        bank_edges=bank_edges,
        p_split=p_split,
        i8=i8,
        pcenter=pcenter,
        resize_mode=cfg.resize_mode,
    )


from raisr_tpu.ops.jit_utils import tpu_jit


@functools.partial(
    tpu_jit, static_argnames=("statics", "passes", "two_pass_mode", "out_h", "out_w")
)
def process_plane_y(
    lr: jnp.ndarray,
    bank_filters: tuple[jnp.ndarray, ...],
    bank_qstr: tuple[jnp.ndarray, ...],
    bank_qcoh: tuple[jnp.ndarray, ...],
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Full multi-pass luma pipeline (RNLProcess CPU path, Raisr.cpp:1294-1397).

    two_pass_mode selects which pass performs the cheap upscale
    ((passIdx+1) == gTwoPassMode, Raisr.cpp:945): mode 1 upscales before pass
    1 (sharpening second pass at HR); mode 2 runs pass 1 at LR size (denoise)
    and upscales before pass 2. The inter-pass intermediate is quantized to
    the integer bit depth, exactly like gIntermediateY (Raisr.cpp:918-927).
    """
    x = lr.astype(jnp.float32)
    for pass_idx in range(passes):
        if pass_idx + 1 == two_pass_mode:
            cheap = cheap_upscale(x, out_h, out_w, statics.bits,
                                  mode=statics.resize_mode)
        else:
            cheap = x
        x = raisr_pass(
            cheap,
            bank_filters[pass_idx],
            bank_qstr[pass_idx],
            bank_qcoh[pass_idx],
            statics,
            pass_idx,
        )
    return x


@functools.partial(
    tpu_jit, static_argnames=("statics", "passes", "two_pass_mode", "out_h", "out_w")
)
def process_plane_y_batch(
    batch_lr: jnp.ndarray,  # [N, H, W]
    bank_filters: tuple[jnp.ndarray, ...],
    bank_qstr: tuple[jnp.ndarray, ...],
    bank_qcoh: tuple[jnp.ndarray, ...],
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Device-resident batched luma pipeline — the production throughput
    path: N frames ride ONE kernel dispatch as a guard-banded vertical stack.

    Each frame is replicate-padded with guard rows and the fused kernel
    applies its zone masks per frame (raisr_pass frame_h/frame_pad), so the
    result is exactly process_plane_y of each frame (the guard band exceeds
    the one-pass support radius of ~8 rows: 5 patch + 1 tensor + 1 gradient
    + 1 census; processed-zone raws never read outside their frame, the same
    geometry that lets the reference's segments run independently,
    Raisr.cpp:1742-1779). Frames stay stacked across passes — guard-row
    contents never influence frame outputs, only masked-off guard outputs.

    This replaces the reference's "run N ffmpeg processes" throughput recipe
    (docs/performance.md:8) with one device-resident batch.
    """
    n, h, w = batch_lr.shape
    s = statics
    # LR guard: 6 rows covers the resize support; when pass 1 runs at LR
    # size (mode 2) it needs the full processing support at LR scale
    lr_pad = 12 if (passes == 2 and two_pass_mode == 2) else 6
    stackable = (
        s.backend == "pallas"
        and bool(s.bank_edges)
        and (s.use_pixel_type or s.pixel_types == 1)
        # only the bilinear resize has a per-frame-exact stacked form (its
        # 6-row guard covers the support; cubic/lanczos widen it and have
        # no tiled weight-vector formulation)
        and s.resize_mode == "bilinear"
        # per-frame stacking must scale exactly: guard and period integral
        # after upscale (true for 2x always; 1.5x with even h and pad)
        and (out_h * lr_pad) % h == 0
        and (out_h * (h + 2 * lr_pad)) % h == 0
    )
    if not stackable:
        # exact-semantics fallback: vmap the single-frame pipeline
        fn = lambda y: process_plane_y(
            y, bank_filters, bank_qstr, bank_qcoh, statics, passes,
            two_pass_mode, out_h, out_w,
        )
        return jax.vmap(fn)(batch_lr)

    x = batch_lr.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (lr_pad, lr_pad), (0, 0)), mode="edge")
    x = x.reshape(n * (h + 2 * lr_pad), w)
    cur_fh, cur_pad = h, lr_pad

    for pass_idx in range(passes):
        if pass_idx + 1 == two_pass_mode:
            tall_h = x.shape[0]
            if out_h == 2 * h and out_w == 2 * w:
                # 2x: the slice-based resize has fixed per-row weights, so
                # whole-stack == per-frame structurally
                cheap = cheap_upscale(x, tall_h * 2, out_w, s.bits)
            else:
                # non-2x: tile per-frame weight vectors across the stack so
                # frame rows are bit-identical to the per-frame resize
                cheap = cheap_upscale_stacked(
                    x, n, h, cur_pad, out_h, cur_pad * out_h // h,
                    out_w, s.bits,
                )
            cur_fh, cur_pad = out_h, cur_pad * out_h // h
        else:
            cheap = x
        x = raisr_pass(
            cheap,
            bank_filters[pass_idx],
            bank_qstr[pass_idx],
            bank_qcoh[pass_idx],
            statics,
            pass_idx,
            frame_h=cur_fh,
            frame_pad=cur_pad,
        )
    x = x.reshape(n, cur_fh + 2 * cur_pad, out_w)
    return x[:, cur_pad : cur_pad + cur_fh, :]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "bits", "mode"))
def process_plane_uv(
    lr: jnp.ndarray, out_h: int, out_w: int, bits: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Chroma planes only get the cheap upscale (Raisr.cpp:1373-1388)."""
    return cheap_upscale(lr.astype(jnp.float32), out_h, out_w, bits, mode=mode)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "bits", "mode"))
def process_plane_uv_batch(
    lr: jnp.ndarray, out_h: int, out_w: int, bits: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Batched chroma cheap upscale ([N, H, W] in, [N, out_h, out_w] out)."""
    n, h, w = lr.shape
    if out_h % h or out_h // h < 2 or mode != "bilinear":
        # non-integral ratios (and the wider cubic/lanczos supports): the
        # per-frame mapping doesn't tile a 2-row-guard stack
        return jax.vmap(
            lambda p: process_plane_uv(p, out_h, out_w, bits, mode)
        )(lr)
    pad = 2  # resize support is 1 row; keep alignment even
    x = jnp.pad(
        lr.astype(jnp.float32), ((0, 0), (pad, pad), (0, 0)), mode="edge"
    )
    ratio = out_h // h
    x = x.reshape(n * (h + 2 * pad), w)
    up = cheap_upscale(x, ratio * x.shape[0], out_w, bits)
    up = up.reshape(n, ratio * (h + 2 * pad), out_w)
    return up[:, ratio * pad : ratio * pad + out_h, :]
