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


def _setup(passes=1, blending=2, bits=8, backend="taps", folder=FOLDER, ratio=2.0, mode=1):
    cfg = RaisrConfig(
        filterfolder=folder, passes=passes, blending=BlendingMode(blending),
        bits=bits, ratio=ratio, mode=mode,
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


def test_row_sharded_15x():
    folder = "/root/reference/filters_1.5x/filters_highres"
    cfg, statics, filters, qstr, qcoh = _setup(folder=folder, ratio=1.5)
    mesh = make_mesh(4, ("rows",))
    lr = _image(48, 40, seed=9)  # 48*1.5=72, 72%4==0
    out = process_plane_row_sharded(
        lr, filters, qstr, qcoh, statics, 1, 1, 72, 60, mesh, "rows"
    )
    single = process_plane_y(lr, filters, qstr, qcoh, statics, 1, 1, 72, 60)
    # non-integral ratio: stripe row mapping is computed in f32 on-device vs
    # f64 at trace time; allow exact-tie rounding flips only
    diff = np.abs(np.asarray(out) - np.asarray(single))
    assert (diff > 0).mean() < 0.002 and diff.max() <= 1
