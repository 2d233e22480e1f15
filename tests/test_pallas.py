"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is exercised
by bench.py and tools/tpu_check.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raisr_tpu.ops.filter_apply import apply_filters_taps
from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas

RNG = np.random.default_rng(7)


def _bank(pixel_types):
    f = np.zeros((216 * pixel_types, 128), np.float32)
    f[:, :121] = RNG.normal(size=(216 * pixel_types, 121)).astype(np.float32) * 0.01
    f[:, 60] += 1.0
    return f


@pytest.mark.parametrize("pixel_types,ratio", [(4, 2), (1, 1)])
@pytest.mark.parametrize("mxu_passes", [2, 3])
def test_matches_taps_interpret(pixel_types, ratio, mxu_passes):
    h, w = 36, 44
    img = RNG.integers(0, 255, size=(h, w)).astype(np.float32)
    filters = _bank(pixel_types)
    buckets = RNG.integers(0, 216, size=(h, w)).astype(np.int32)
    if pixel_types == 4:
        pt = ((np.arange(h)[:, None] - 5) % 2) * 2 + (np.arange(w)[None, :] - 5) % 2
    else:
        pt = np.zeros((h, w), np.int32)
    idx = buckets * pixel_types + pt
    ref = np.asarray(
        apply_filters_taps(jnp.asarray(img), jnp.asarray(idx), jnp.asarray(filters), 11)
    )
    out = np.asarray(
        apply_filters_pallas(
            jnp.asarray(img),
            jnp.asarray(buckets),
            jnp.asarray(filters),
            pixel_types=pixel_types,
            ratio=ratio,
            mxu_passes=mxu_passes,
            interpret=True,
        )
    )
    # interior only: borders are outside the processed zone by design
    d = np.abs(out[6:-6, 6:-6] - ref[6:-6, 6:-6])
    # hi/lo bf16 split: ~2^-17 relative
    assert d.max() < 5e-3, d.max()


def test_ten_bit_range_needs_three_passes():
    h, w = 28, 36
    img = RNG.integers(0, 1023, size=(h, w)).astype(np.float32)
    filters = _bank(4)
    buckets = RNG.integers(0, 216, size=(h, w)).astype(np.int32)
    pt = ((np.arange(h)[:, None] - 5) % 2) * 2 + (np.arange(w)[None, :] - 5) % 2
    idx = buckets * 4 + pt
    ref = np.asarray(
        apply_filters_taps(jnp.asarray(img), jnp.asarray(idx), jnp.asarray(filters), 11)
    )
    out3 = np.asarray(
        apply_filters_pallas(
            jnp.asarray(img), jnp.asarray(buckets), jnp.asarray(filters),
            mxu_passes=3, interpret=True,
        )
    )
    d3 = np.abs(out3[6:-6, 6:-6] - ref[6:-6, 6:-6]).max()
    assert d3 < 0.05, d3  # well under 10-bit LSB
