"""Sharding tests on the 8-device virtual CPU mesh.

The row-sharded (spatial) path must reproduce the single-device pipeline
bit-for-bit: the halo fully covers resize/patch/census support and all zone
masks use global coordinates (unlike the reference, whose segment boundaries
are only *approximately* invisible thanks to aligned zones).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from raisr_tpu.config import RaisrConfig, BlendingMode
from raisr_tpu.model.loader import load_model
from raisr_tpu.ops.pipeline import pass_statics, process_plane_y
from raisr_tpu.parallel.sharding import (
    make_mesh,
    process_batch_dp,
    process_plane_row_sharded,
)

FOLDER = "/root/reference/filters_2x/filters_highres"


def _setup(passes=1, blending=2, bits=8, backend="taps", folder=FOLDER, ratio=2.0, mode=1, dtype="float32"):
    cfg = RaisrConfig(
        filterfolder=folder, passes=passes, blending=BlendingMode(blending),
        bits=bits, ratio=ratio, mode=mode, dtype=dtype,
    )
    model = load_model(folder, cfg)
    statics = pass_statics(cfg, model, backend)
    filters = tuple(jnp.asarray(b.filters) for b in model.banks)
    qstr = tuple(jnp.asarray(b.qstr) for b in model.banks)
    qcoh = tuple(jnp.asarray(b.qcoh) for b in model.banks)
    return cfg, statics, filters, qstr, qcoh


def _image(h, w, bits=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w))
    for axis in (0, 1):
        img = np.apply_along_axis(lambda r: np.convolve(r, np.ones(5) / 5, "same"), axis, img)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return jnp.asarray(np.floor(img * ((1 << bits) - 1)).astype(np.float32))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_batch_dp_matches_single():
    cfg, statics, filters, qstr, qcoh = _setup()
    mesh = make_mesh(8, ("data",))
    assert mesh.shape["data"] == 8
    batch = jnp.stack([_image(20, 28, seed=i) for i in range(8)])
    out = process_batch_dp(
        batch, filters, qstr, qcoh, statics, 1, 1, 40, 56, mesh, "data"
    )
    for i in range(8):
        single = process_plane_y(batch[i], filters, qstr, qcoh, statics, 1, 1, 40, 56)
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(single))


@pytest.mark.parametrize("blending", [1, 2])
def test_row_sharded_matches_single(blending):
    cfg, statics, filters, qstr, qcoh = _setup(blending=blending)
    mesh = make_mesh(8, ("rows",))
    lr = _image(48, 36)  # stripes of 6 LR rows -> 12 HR rows each
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 96, 72, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 96, 72)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_row_sharded_two_pass_mode1():
    cfg, statics, filters, qstr, qcoh = _setup(passes=2)
    mesh = make_mesh(4, ("rows",))
    lr = _image(32, 36, seed=5)
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 2, 1, 64, 72, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 2, 1, 64, 72)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_row_sharded_two_pass_mode2_denoise():
    folder = "/root/reference/filters_2x/filters_denoise"
    cfg, statics, filters, qstr, qcoh = _setup(passes=2, folder=folder, mode=2)
    mesh = make_mesh(4, ("rows",))
    lr = _image(32, 36, seed=6)
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 2, 2, 64, 72, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 2, 2, 64, 72)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_engine_shard_spec_parsing():
    from raisr_tpu.config import RaisrError
    from raisr_tpu.engine import parse_shard_spec

    assert parse_shard_spec(None) == {"data": 1, "rows": 1}
    assert parse_shard_spec("data=4") == {"data": 4, "rows": 1}
    assert parse_shard_spec("data=2,rows=2") == {"data": 2, "rows": 2}
    assert parse_shard_spec(" rows=8 ") == {"data": 1, "rows": 8}
    for bad in ("data", "cols=2", "data=x", "data=0"):
        with pytest.raises(RaisrError):
            parse_shard_spec(bad)


def test_engine_shard_data_matches_unsharded():
    """The user-facing multi-chip path (engine shard= / CLI --shard): a
    data-sharded batch must equal the unsharded batched output."""
    from raisr_tpu.engine import RaisrEngine

    cfg = RaisrConfig(filterfolder=FOLDER, passes=1, backend="reference")
    base = RaisrEngine(cfg)
    sharded = RaisrEngine(cfg, shard="data=4")
    batch = jnp.stack([_image(20, 28, seed=i) for i in range(8)])
    np.testing.assert_array_equal(
        np.asarray(sharded.process_batch_y(batch)),
        np.asarray(base.process_batch_y(batch)),
    )


def test_engine_shard_rows_matches_unsharded():
    from raisr_tpu.engine import RaisrEngine

    cfg = RaisrConfig(filterfolder=FOLDER, passes=1, backend="reference")
    base = RaisrEngine(cfg)
    sharded = RaisrEngine(cfg, shard="data=2,rows=2")
    batch = jnp.stack([_image(24, 28, seed=i) for i in range(4)])
    np.testing.assert_array_equal(
        np.asarray(sharded.process_batch_y(batch)),
        np.asarray(base.process_batch_y(batch)),
    )
    single = RaisrEngine(cfg, shard="rows=4")
    np.testing.assert_array_equal(
        np.asarray(single.upscale_y(batch[0])),
        np.asarray(base.upscale_y(batch[0])),
    )


def test_engine_shard_errors():
    from raisr_tpu.config import RaisrError
    from raisr_tpu.engine import RaisrEngine

    cfg = RaisrConfig(filterfolder=FOLDER, passes=1, backend="reference")
    with pytest.raises(RaisrError, match="devices"):
        RaisrEngine(cfg, shard="data=64")
    eng = RaisrEngine(cfg, shard="data=4")
    with pytest.raises(RaisrError, match="divisible"):
        eng.process_batch_y(jnp.stack([_image(20, 28, seed=i) for i in range(6)]))
    eng2 = RaisrEngine(cfg, shard="rows=4")
    with pytest.raises(RaisrError, match="stripe"):
        eng2.upscale_y(_image(30, 28))  # 30/4 not integral


@pytest.mark.parametrize(
    "blending",
    [1, pytest.param(2, marks=pytest.mark.slow)],
)
def test_row_sharded_pallas_fused_matches_single(blending):
    """Row stripes must run the SAME whole-pass fused kernel as a full frame
    (VERDICT r2 #2): with global row0/zone_h zone masks the sharded pallas
    path is bit-identical to the single-device pallas path (interpret mode
    on the CPU mesh; real-Mosaic covered by tools/tpu_check.py)."""
    import dataclasses

    cfg, statics, filters, qstr, qcoh = _setup(
        blending=blending, backend="pallas"
    )
    statics = dataclasses.replace(statics, backend_interpret=True)
    mesh = make_mesh(4, ("rows",))
    lr = _image(24, 32)
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 48, 64, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 48, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


@pytest.mark.slow
def test_row_sharded_pallas_fused_two_pass():
    import dataclasses

    cfg, statics, filters, qstr, qcoh = _setup(passes=2, backend="pallas")
    statics = dataclasses.replace(statics, backend_interpret=True)
    mesh = make_mesh(4, ("rows",))
    lr = _image(24, 32, seed=4)
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 2, 1, 48, 64, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 2, 1, 48, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


@pytest.mark.parametrize(
    "dtype,bits", [("int8", 8), ("bfloat16", 10)], ids=["i8", "fast10"]
)
def test_row_sharded_pallas_fused_fast_tiers(dtype, bits):
    """The stripe path must carry the TIER statics into the kernel: round 5
    found `i8` was silently dropped by the stripe kernel call (striped int8
    ran the plain bf16 tier and diverged from the unsharded int8 output).
    Bit-identity vs the unsharded fused run, per fast tier."""
    import dataclasses

    cfg, statics, filters, qstr, qcoh = _setup(
        backend="pallas", dtype=dtype, bits=bits
    )
    statics = dataclasses.replace(statics, backend_interpret=True)
    mesh = make_mesh(4, ("rows",))
    lr = _image(24, 32, bits=bits, seed=11)
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 48, 64, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 48, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_row_sharded_pallas_fused_15x():
    """Single-phase (1.5x) whole-pass kernel under row sharding: bit-identical
    to the single-device pipeline (same kernel with global zones; the cheap
    upscale runs in exact-integer arithmetic at production ratios)."""
    import dataclasses

    folder = "/root/reference/filters_1.5x/filters_highres"
    cfg, statics, filters, qstr, qcoh = _setup(
        folder=folder, ratio=1.5, backend="pallas"
    )
    statics = dataclasses.replace(statics, backend_interpret=True)
    mesh = make_mesh(4, ("rows",))
    lr = _image(32, 32, seed=9)  # 32*1.5=48, 48/4=12 rows/stripe
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 48, 48, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 48, 48)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))


def test_row_sharded_15x():
    folder = "/root/reference/filters_1.5x/filters_highres"
    cfg, statics, filters, qstr, qcoh = _setup(folder=folder, ratio=1.5)
    mesh = make_mesh(4, ("rows",))
    lr = _image(48, 40, seed=9)  # 48*1.5=72, 72%4==0
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 72, 60, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 72, 60)
    # bit-identical: the 1.5x cheap upscale runs in exact-integer arithmetic
    # (resize._bilinear_exact_rounded) in both the striped and single paths
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))

def test_engine_shard_8k_geometry():
    """BASELINE config 5 sharding shape: a v5e-8-slice layout (data=4,rows=2
    on the 8-device mesh) at the 8K output width (w=7680, the kernel's wide
    wide-band branch trigger (tb2=24) — covered on real Mosaic by tools/tpu_check.py
    full_kernel_8k_wide). Height is kept small so the CPU-mesh run stays
    cheap; the stripe/batch arithmetic being validated is width-driven.
    Reference analogue: RNLSetRes plans arbitrary geometries
    (Raisr.cpp:1681-1829)."""
    from raisr_tpu.engine import RaisrEngine

    cfg = RaisrConfig(filterfolder=FOLDER, passes=2, backend="reference")
    base = RaisrEngine(cfg)
    sharded = RaisrEngine(cfg, shard="data=4,rows=2")
    batch = jnp.stack([_image(64, 3840, seed=20 + i) for i in range(4)])
    out = sharded.process_batch_y(batch)
    assert out.shape == (4, 128, 7680)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(base.process_batch_y(batch))
    )
