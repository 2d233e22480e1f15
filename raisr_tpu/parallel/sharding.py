"""Multi-chip sharding for RAISR.

The reference's only compute parallelism is a thread pool slicing each frame
into halo-expanded horizontal row segments with volatile spin-wait barriers
(reference: Library/Raisr.cpp:1369-1394, zones :1742-1779, spin :905-916).
The TPU-native equivalents:

  data parallelism   — a batch of frames sharded over the mesh ("streams";
                       the reference's N-parallel-ffmpeg methodology,
                       docs/performance.md:8). Zero communication.
  spatial (row-tile) — one frame's rows sharded over the mesh, with the
                       6+2-row halo exchanged via jax.lax.ppermute over ICI
                       once per pass; the inter-pass barrier is XLA dataflow
                       instead of spin-waiting on threadStatus.

Row stripes run the SAME whole-pass fused kernel as full frames (its
row0/zone_h inputs shift every zone mask to global coordinates), so per-chip
throughput under sharding is the single-chip kernel's — matching the
reference's segments running the same hot loop as whole frames
(Raisr.cpp:1369-1382).

Exactness: the DP path and ratio-2 row stripes are bit-identical to the
single-device pipeline (tests enforce this) — the halo fully covers the
resize + patch + census support and all zone masks use global coordinates.
Non-2x (e.g. 1.5x) row stripes are bit-identical through the RAISR pass,
but the striped cheap upscale may flip rare exact-.5 rounding ties by 1 LSB
(<0.2% of pixels; tests/test_sharding.py::test_row_sharded_15x) because the
sharded and whole-plane resizes compile to differently-fused f32 FMA chains.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from raisr_tpu.config import CT_MARGIN
from raisr_tpu.ops.jit_utils import compiler_options
from raisr_tpu.ops.pipeline import (
    PassStatics,
    raisr_pass,
    processed_col_end,
    select_fused_tb2,
)
from raisr_tpu.ops import hashing, census
from raisr_tpu.ops.filter_apply import apply_filters_taps, apply_filters_conv
from raisr_tpu.model.gaussian import gaussian_weights

# Halo (in HR rows) a device needs beyond its output stripe: patch/gradient
# support (loop_margin = 6) + census margin (1), rounded up to keep LR halo
# integral for ratio 1.5 -> use 8.
HR_HALO = 8


def _top_jit(fn):
    """Top-level jit with the TPU scoped-VMEM option.

    shard_map wrappers here are the compile root for the fused pallas
    kernel, so the xla_tpu_scoped_vmem_limit_kib option must ride THESE
    jits (the same rule as engine.py's one-jit serving step): without it
    the default 16 MB scoped limit rejects wide 2-pass stripe geometries
    that the unsharded pipeline compiles fine."""
    opts = compiler_options()
    kw = {} if opts is None else {"compiler_options": opts}
    return jax.jit(fn, **kw)


def make_mesh(n_devices: int | None = None, axis_names=("data", "rows")) -> Mesh:
    """Mesh over available devices: frames x row-stripes."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devices)} "
            f"visible on platform '{devices[0].platform}' — for a virtual "
            "multi-device CPU mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} before JAX "
            "initializes a backend"
        )
    devices = np.asarray(devices[:n])
    if len(axis_names) == 1:
        shape = (n,)
    elif n % 2 == 0 and n >= 4:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    return Mesh(devices.reshape(shape), axis_names)


# --------------------------------------------------------------------------
# Data parallelism over a batch of frames
# --------------------------------------------------------------------------


def process_batch_dp(
    batch_lr: jnp.ndarray,
    filters: tuple,
    qstr: tuple,
    qcoh: tuple,
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    out_h: int,
    out_w: int,
    mesh: Mesh,
    axis: str = "data",
):
    """[N, H, W] -> [N, oH, oW], N sharded over `axis`. Pure DP, no
    collectives. Each device runs the device-resident batched path on its
    local frames (guard-banded stack, one kernel dispatch per device)."""
    from raisr_tpu.ops.pipeline import process_plane_y_batch

    n_banks = len(filters)

    def fn(batch_local, *banks_flat):
        f = banks_flat[:n_banks]
        qs = banks_flat[n_banks : 2 * n_banks]
        qc = banks_flat[2 * n_banks :]
        return process_plane_y_batch(
            batch_local, f, qs, qc, statics, passes, two_pass_mode,
            out_h, out_w,
        )

    banks_flat = tuple(filters) + tuple(qstr) + tuple(qcoh)
    fn_sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis, None, None),) + (P(),) * len(banks_flat),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return _top_jit(fn_sharded)(batch_lr, *banks_flat)


# --------------------------------------------------------------------------
# Spatial (row-stripe) parallelism within one frame
# --------------------------------------------------------------------------


def _exchange_halo(stripe: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Concatenate [halo-from-up, stripe, halo-from-down].

    Edge devices replicate their own border rows, which reproduces the
    whole-frame border-replicate resize clamp exactly."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    top_rows = stripe[:halo]  # our first rows -> sent down
    bot_rows = stripe[-halo:]  # our last rows -> sent up

    from_up = lax.ppermute(bot_rows, axis, [(i, i + 1) for i in range(n - 1)])
    from_down = lax.ppermute(top_rows, axis, [(i + 1, i) for i in range(n - 1)])

    # ppermute fills non-receiving devices with zeros; replace with edge
    # replication of the first/last row (global border clamp).
    first_row = jnp.broadcast_to(stripe[0:1], (halo, stripe.shape[1]))
    last_row = jnp.broadcast_to(stripe[-1:], (halo, stripe.shape[1]))
    from_up = jnp.where(idx == 0, first_row, from_up)
    from_down = jnp.where(idx == n - 1, last_row, from_down)
    return jnp.concatenate([from_up, stripe, from_down], axis=0)


def _upscale_stripe(
    lr_ext: jnp.ndarray, lr_halo: int, out_rows: int, hr_halo: int, out_w: int,
    out_h_global: int, bits: int, lr_h_global: int, axis: str,
    lr_stripe_rows: int,
) -> jnp.ndarray:
    """Cheap-upscale an LR stripe (with halo) to its HR stripe (with halo).

    The row mapping (src = (dst + 0.5) * in/out - 0.5, border clamp) is
    precomputed at trace time in float64 for *global* destination rows
    [-halo, out_h + halo) — exactly the whole-plane table — and sliced per
    device. At the production ratios (2x, 1.5x) the interpolation itself
    runs in the exact-integer form of resize._bilinear_exact_rounded, so the
    sharded resize is bit-identical to the whole-plane one BY CONSTRUCTION
    (exact arithmetic cannot depend on how XLA fuses the FMA chains); other
    ratios fall back to the f32 chain, where rare exact-.5 ties may flip.
    The LR halo guarantees the needed source rows are local."""
    from raisr_tpu.ops.resize import _axis_weights_exact

    idx = lax.axis_index(axis)
    hr_stripe_rows = out_rows  # per-device HR core rows
    lr_start = idx * lr_stripe_rows - lr_halo  # global first LR row in lr_ext
    total_hr = hr_stripe_rows + 2 * hr_halo

    if out_h_global == 2 * lr_h_global:
        vden = 4.0
    elif 2 * out_h_global == 3 * lr_h_global:
        vden = 6.0
    else:
        vden = 1.0
    dst_ext = np.arange(-hr_halo, out_h_global + hr_halo, dtype=np.float64)
    src_ext = np.clip(
        (dst_ext + 0.5) * (lr_h_global / out_h_global) - 0.5, 0.0, lr_h_global - 1
    )
    r0_ext = np.floor(src_ext).astype(np.int32)
    r1_ext = np.minimum(r0_ext + 1, lr_h_global - 1)
    frac_ext = src_ext - r0_ext
    if vden != 1.0:
        frac_ext = np.round(frac_ext * vden)  # exact small ints
    frac_ext = frac_ext.astype(np.float32)

    start = idx * hr_stripe_rows  # offset into the extended tables
    r0g = lax.dynamic_slice(jnp.asarray(r0_ext), (start,), (total_hr,))
    r1g = lax.dynamic_slice(jnp.asarray(r1_ext), (start,), (total_hr,))
    frac = lax.dynamic_slice(jnp.asarray(frac_ext), (start,), (total_hr,))[:, None]
    r0 = jnp.clip(r0g - lr_start, 0, lr_ext.shape[0] - 1)
    r1 = jnp.clip(r1g - lr_start, 0, lr_ext.shape[0] - 1)
    a = jnp.take(lr_ext, r0, axis=0)
    rows = a * vden + (jnp.take(lr_ext, r1, axis=0) - a) * frac

    # horizontal: same as whole-plane
    in_w = lr_ext.shape[1]
    cv = _axis_weights_exact(in_w, out_w)
    if cv is not None:
        c0, c1, cf, cden = cv
    else:
        dst_c = np.arange(out_w, dtype=np.float64)
        src_c = np.clip((dst_c + 0.5) * (in_w / out_w) - 0.5, 0.0, in_w - 1)
        c0 = np.floor(src_c).astype(np.int32)
        c1 = np.minimum(c0 + 1, in_w - 1)
        cf = (src_c - c0).astype(np.float32)
        cden = 1.0
    b = jnp.take(rows, c0, axis=1)
    out = b * cden + (jnp.take(rows, c1, axis=1) - b) * cf[None, :]
    den = vden * cden
    max_full = float((1 << bits) - 1)
    return jnp.clip(jnp.floor((out + den / 2) / den), 0.0, max_full)


def _raisr_pass_stripe(
    cheap_ext: jnp.ndarray,
    filters: jnp.ndarray,
    qstr: jnp.ndarray,
    qcoh: jnp.ndarray,
    statics: PassStatics,
    hr_halo: int,
    core_rows: int,
    total_h: int,
    axis: str,
    pass_idx: int = 0,
) -> jnp.ndarray:
    """One RAISR pass on an HR stripe with halo; returns the core rows.

    Identical math to ops.pipeline.raisr_pass but all zone masks are built
    from global row coordinates. On the pallas backend the stripe runs the
    SAME whole-pass fused kernel as a full frame (row0/zone_h global zone
    coordinates) — matching the reference's segments running the same hot
    loop as whole frames (Raisr.cpp:1369-1382); per-chip throughput under
    sharding is therefore the single-chip kernel's."""
    s = statics
    lm = s.loop_margin
    h_ext, w = cheap_ext.shape
    idx = lax.axis_index(axis)
    g_start = idx * core_rows - hr_halo  # global row of cheap_ext[0]

    if s.backend == "pallas" and s.bank_edges and (
        s.use_pixel_type or s.pixel_types == 1
    ):
        from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor
        from raisr_tpu.ops.pallas.full_kernel import (
            raisr_pass_pallas_full,
            raisr_pass_pallas_full_single,
        )

        edges = s.bank_edges[pass_idx]
        kw = dict(
            k1d=tuple(float(v) for v in gaussian_kernel_1d(s.patch_size)),
            nf=normalization_factor(s.bits),
            qstr=edges[0],
            qcoh=edges[1],
            qangle=s.qangle,
            qstrength=s.qstrength,
            qcoherence=s.qcoherence,
            patch_size=s.patch_size,
            mxu_passes=s.mxu_passes,
            min_val=s.min_val,
            max_val=s.max_val,
            blending=int(s.blending),
            exact_edges=s.exact_edges,
            interpret=s.backend_interpret,
            row0=g_start,
            zone_h=total_h,
        )
        from raisr_tpu.ops.pallas.filter_kernel import _pad_to

        if s.use_pixel_type:
            # stripe row 0 has even global parity (core_rows and hr_halo are
            # even), so the kernel's local row phases equal global phases.
            # tb2 exactly as for a full frame (shared helper — the stripe
            # path once drifted from pipeline.py and kept tb2=32 at the
            # w>4608 scoped-VMEM OOM geometry), clamped so short stripes
            # don't process padding-only bands.
            tb2 = min(select_fused_tb2(s, w), _pad_to(-(-h_ext // 2), 8))
            out = raisr_pass_pallas_full(
                cheap_ext, filters, patch_margin=s.patch_margin, tb2=tb2,
                p_split=s.p_split, i8=s.i8, pcenter=s.pcenter, **kw
            )
        else:
            tb2 = min(16 if w <= 4608 else 8, _pad_to(-(-h_ext // 2), 4))
            kw["mxu_passes"] = 3 if s.p_split else s.mxu_passes
            out = raisr_pass_pallas_full_single(
                cheap_ext, filters, tb2=tb2, **kw
            )
        return out[hr_halo : hr_halo + core_rows]

    weights = gaussian_weights(s.patch_size, s.bits)
    gx, gy = hashing.gradients(cheap_ext)
    a, b, d = hashing.structure_tensor(gx, gy, jnp.asarray(weights))
    buckets = hashing.hash_buckets(a, b, d, qstr, qcoh, s.qangle, s.qstrength, s.qcoherence)

    # pixel phase from global coords
    if s.use_pixel_type:
        gr = (jax.lax.broadcasted_iota(jnp.int32, (h_ext, w), 0) + g_start - s.patch_margin) % s.ratio_int
        gc = (jax.lax.broadcasted_iota(jnp.int32, (h_ext, w), 1) - s.patch_margin) % s.ratio_int
        ptype = gr * s.ratio_int + gc
    else:
        ptype = jnp.zeros((h_ext, w), jnp.int32)

    if s.backend == "pallas":
        # stripe starts are even (core rows and halo are even), so local
        # pixel phases equal global phases and the fused kernel applies
        from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas

        raw = apply_filters_pallas(
            cheap_ext, buckets, filters,
            patch_size=s.patch_size, pixel_types=s.pixel_types,
            patch_margin=s.patch_margin, ratio=s.ratio_int,
            mxu_passes=s.mxu_passes,
        )
    elif s.backend == "conv" and not s.use_pixel_type:
        raw = apply_filters_conv(cheap_ext, buckets, filters, s.patch_size, 1, s.patch_margin, s.ratio_int)
    else:
        # phase-strided conv needs static phase alignment; stripes have
        # device-dependent phase -> taps formulation
        filter_idx = buckets * s.pixel_types + ptype
        raw = apply_filters_taps(cheap_ext, filter_idx, filters, s.patch_size)

    keep = (raw > float(s.min_val)) & (raw < float(s.max_val))
    raisr_px = jnp.where(keep, raw, cheap_ext)

    col_end = processed_col_end(w, lm, s.exact_edges)
    g_rows = jax.lax.broadcasted_iota(jnp.int32, (h_ext, w), 0) + g_start
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h_ext, w), 1)
    proc = (g_rows >= lm) & (g_rows < total_h - lm) & (col_ids >= lm) & (col_ids < col_end)

    if s.blending == 1:  # Randomness
        blended = census.blend_randomness(cheap_ext, raisr_px)
        val = jnp.clip(jnp.floor(blended + 0.5), float(s.min_val), float(s.max_val))
        out = jnp.where(proc, val, cheap_ext)
    else:
        hr_buf = jnp.where(proc, raisr_px, cheap_ext)
        blended = census.blend_count_of_bits_changed(cheap_ext, hr_buf)
        blend_zone = (
            (g_rows >= CT_MARGIN)
            & (g_rows < total_h - CT_MARGIN)
            & (col_ids >= CT_MARGIN)
            & (col_ids < w - CT_MARGIN)
        )
        val = jnp.clip(jnp.floor(blended + 0.5), float(s.min_val), float(s.max_val))
        out = jnp.where(blend_zone, val, cheap_ext)
    return out[hr_halo : hr_halo + core_rows]


def make_stripe_fn(
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    lr_h: int,
    out_h: int,
    out_w: int,
    n_stripes: int,
    axis: str = "rows",
):
    """Per-device stripe pipeline: LR stripe [lr_h/n, W] -> HR stripe."""
    # the stripe halo resize is built on the bilinear support/weights only
    # (the engine rejects shard+non-bilinear configs before reaching here)
    assert statics.resize_mode == "bilinear", statics.resize_mode
    assert out_h % n_stripes == 0 and lr_h % n_stripes == 0, (
        "row count must divide the mesh axis"
    )
    assert (out_h // n_stripes) % 2 == 0, (
        "stripes must start on even rows (pixel-phase alignment)"
    )
    hr_stripe = out_h // n_stripes
    lr_stripe = lr_h // n_stripes
    # LR halo needed to synthesize HR_HALO extra HR rows
    lr_halo = int(np.ceil((HR_HALO + 1) * lr_h / out_h)) + 1

    def per_stripe(lr_s, *banks_flat):
        fl = banks_flat[:passes]
        qs = banks_flat[passes : 2 * passes]
        qc = banks_flat[2 * passes :]
        x = lr_s.astype(jnp.float32)
        for p in range(passes):
            if p + 1 == two_pass_mode:
                lr_ext = _exchange_halo(x, lr_halo, axis)
                cheap_ext = _upscale_stripe(
                    lr_ext, lr_halo, hr_stripe, HR_HALO, out_w,
                    out_h, statics.bits, lr_h, axis, lr_stripe,
                )
            else:
                cheap_ext = _exchange_halo(x, HR_HALO, axis)
            x = _raisr_pass_stripe(
                cheap_ext, fl[p], qs[p], qc[p], statics, HR_HALO,
                hr_stripe if p + 1 >= two_pass_mode else lr_stripe,
                out_h if p + 1 >= two_pass_mode else lr_h,
                axis,
                pass_idx=p,
            )
        return x

    return per_stripe


def _bank_specs(passes: int):
    return tuple(P(None, None) for _ in range(passes)) + tuple(
        P(None) for _ in range(2 * passes)
    )


def process_plane_row_sharded(
    lr: jnp.ndarray,
    filters: tuple,
    qstr: tuple,
    qcoh: tuple,
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    out_h: int,
    out_w: int,
    mesh: Mesh,
    axis: str = "rows",
):
    """One frame, rows sharded over `axis` (single-stream latency mode)."""
    n = mesh.shape[axis]
    per_stripe = make_stripe_fn(
        statics, passes, two_pass_mode, lr.shape[0], out_h, out_w, n, axis
    )
    fn = jax.shard_map(
        per_stripe,
        mesh=mesh,
        in_specs=(P(axis, None),) + _bank_specs(passes),
        out_specs=P(axis, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    return _top_jit(fn)(lr, *filters, *qstr, *qcoh)


def process_batch_2d(
    batch_lr: jnp.ndarray,
    filters: tuple,
    qstr: tuple,
    qcoh: tuple,
    statics: PassStatics,
    passes: int,
    two_pass_mode: int,
    out_h: int,
    out_w: int,
    mesh: Mesh,
    data_axis: str = "data",
    rows_axis: str = "rows",
):
    """[N, H, W] with N sharded over `data_axis` (DP) and rows sharded over
    `rows_axis` (spatial, halo via ppermute) — the full multi-chip step."""
    n_rows = mesh.shape[rows_axis]
    per_stripe = make_stripe_fn(
        statics, passes, two_pass_mode, batch_lr.shape[1], out_h, out_w,
        n_rows, rows_axis,
    )

    def per_shard(batch_s, *banks_flat):
        return jax.vmap(lambda y: per_stripe(y, *banks_flat))(batch_s)

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(data_axis, rows_axis, None),) + _bank_specs(passes),
        out_specs=P(data_axis, rows_axis, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    return _top_jit(fn)(batch_lr, *filters, *qstr, *qcoh)
