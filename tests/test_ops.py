"""Op-level tests against the independent NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import np_oracle
from raisr_tpu.model.gaussian import gaussian_weights, GAUSSIAN_11x11
from raisr_tpu.ops import hashing, census
from raisr_tpu.ops.resize import cheap_upscale, bilinear_upscale
from raisr_tpu.ops.filter_apply import apply_filters_taps, apply_filters_conv
from raisr_tpu.ops.pipeline import processed_col_end

RNG = np.random.default_rng(0)


class TestGaussian:
    def test_symmetric_and_normalized(self):
        w = GAUSSIAN_11x11
        assert w.shape == (11, 11)
        np.testing.assert_array_equal(w, w[::-1, :])
        np.testing.assert_array_equal(w, w[:, ::-1])
        np.testing.assert_array_equal(w, w.T)
        assert abs(w.sum() - 1.0) < 1e-3  # 6-digit literals, loosely normalized

    def test_matches_create_gaussian_kernel_formula(self):
        # The literal table equals outer(k, k) for the sigma=2 kernel
        # (Raisr.cpp:141-185) up to its 6-significant-digit printing.
        from raisr_tpu.model.gaussian import gaussian_kernel_1d

        k = gaussian_kernel_1d(11, 2.0)
        np.testing.assert_allclose(np.outer(k, k), GAUSSIAN_11x11, rtol=5e-5)

    def test_nf_scaling(self):
        w8 = gaussian_weights(11, 8)
        np.testing.assert_allclose(w8, GAUSSIAN_11x11 / (255.0**2 * 4.0), rtol=1e-6)


class TestResize:
    @pytest.mark.parametrize("ratio", [2.0, 1.5])
    @pytest.mark.parametrize("bits", [8, 10])
    def test_matches_oracle(self, ratio, bits):
        img = RNG.integers(0, (1 << bits) - 1, size=(17, 23)).astype(np.float32)
        out_h, out_w = int(17 * ratio), int(23 * ratio)
        ours = np.asarray(cheap_upscale(jnp.asarray(img), out_h, out_w, bits))
        oracle = np_oracle.cheap_upscale(img, out_h, out_w, bits)
        # identical up to f32-vs-f64 rounding at exact .5 boundaries
        mism = np.abs(ours - oracle) > 0
        assert mism.mean() < 0.005
        assert np.abs(ours - oracle).max() <= 1

    def test_identity(self):
        img = RNG.integers(0, 255, size=(12, 16)).astype(np.float32)
        out = np.asarray(cheap_upscale(jnp.asarray(img), 12, 16, 8))
        np.testing.assert_array_equal(out, img)

    def test_2x_exact_weights(self):
        # For 2x the mapping src=(d+0.5)/2-0.5 gives weights 0.25/0.75 exactly.
        img = np.array([[0.0, 100.0, 200.0]], dtype=np.float32)
        out = np.asarray(bilinear_upscale(jnp.asarray(img), 1, 6))
        np.testing.assert_allclose(out[0], [0.0, 25.0, 75.0, 125.0, 175.0, 200.0])

    def test_stacked_15x_bit_identical_to_per_frame(self):
        """cheap_upscale_stacked frame rows must equal cheap_upscale of each
        frame alone, bit for bit, even thousands of rows into the stack
        (global-offset f64 weights can flip round-half-up ties; the stacked
        path tiles the per-frame weight vectors instead)."""
        from raisr_tpu.ops.resize import cheap_upscale_stacked

        h, w, pad, n = 36, 24, 12, 40  # stack of 2400 input rows
        out_h, out_w = 54, 36
        pad_out = pad * out_h // h
        frames = [
            RNG.integers(0, 255, size=(h, w)).astype(np.float32)
            for _ in range(n)
        ]
        stack = np.concatenate(
            [np.pad(f, ((pad, pad), (0, 0)), mode="edge") for f in frames]
        )
        tall = np.asarray(
            cheap_upscale_stacked(
                jnp.asarray(stack), n, h, pad, out_h, pad_out, out_w, 8
            )
        )
        period = out_h + 2 * pad_out
        for i, f in enumerate(frames):
            got = tall[i * period + pad_out : i * period + pad_out + out_h]
            want = np.asarray(cheap_upscale(jnp.asarray(f), out_h, out_w, 8))
            assert np.array_equal(got, want), (i, np.abs(got - want).max())


class TestHash:
    def test_matches_oracle(self):
        n = 4096
        a = np.abs(RNG.normal(size=n)).astype(np.float32) * 0.05
        b = RNG.normal(size=n).astype(np.float32) * 0.02
        d = np.abs(RNG.normal(size=n)).astype(np.float32) * 0.05
        # make PSD-ish like real structure tensors (a*d >= b*b not enforced;
        # the pipeline guards with max(disc, 0))
        qstr = np.array([0.001269, 0.022169], np.float32)
        qcoh = np.array([0.192916, 0.405942], np.float32)
        ours = np.asarray(
            hashing.hash_buckets(
                jnp.asarray(a).reshape(64, 64),
                jnp.asarray(b).reshape(64, 64),
                jnp.asarray(d).reshape(64, 64),
                jnp.asarray(qstr),
                jnp.asarray(qcoh),
                24,
                3,
                3,
            )
        ).ravel()
        oracle = np.array(
            [np_oracle.hash_bucket(a[i], b[i], d[i], qstr, qcoh) for i in range(n)]
        )
        # f32 vs f64 math can flip a bucket at exact bin edges only
        assert (ours != oracle).mean() < 0.002

    def test_zero_tensor(self):
        z = jnp.zeros((8, 8))
        qstr = jnp.asarray([0.001269, 0.022169])
        qcoh = jnp.asarray([0.192916, 0.405942])
        buckets = np.asarray(hashing.hash_buckets(z, z, z, qstr, qcoh, 24, 3, 3))
        # flat patch: angle=atan2_approx(0,1)>0 small, str=0, coh=0 -> bucket 0
        assert (buckets == np_oracle.hash_bucket(0.0, 0.0, 0.0, qstr, qcoh)).all()

    def test_structure_tensor_matches_window_sums(self):
        img = RNG.integers(0, 255, size=(24, 32)).astype(np.float32)
        weights = gaussian_weights(11, 8)
        gx, gy = hashing.gradients(jnp.asarray(img))
        a, b, d = hashing.structure_tensor(gx, gy, jnp.asarray(weights))
        gx_np, gy_np = np.asarray(gx), np.asarray(gy)
        for r, c in [(6, 6), (10, 15), (17, 25)]:
            wx = gx_np[r - 5 : r + 6, c - 5 : c + 6]
            wy = gy_np[r - 5 : r + 6, c - 5 : c + 6]
            # f32 conv vs f64 window sum; b is a signed sum with cancellation
            np.testing.assert_allclose(a[r, c], (weights * wx * wx).sum(), rtol=1e-3)
            np.testing.assert_allclose(b[r, c], (weights * wx * wy).sum(), rtol=1e-3, atol=1e-6)
            np.testing.assert_allclose(d[r, c], (weights * wy * wy).sum(), rtol=1e-3)

    def test_pixel_types(self):
        pt = np.asarray(hashing.pixel_types(8, 8, 2, 5, True))
        for r in range(8):
            for c in range(8):
                assert pt[r, c] == ((r - 5) % 2) * 2 + ((c - 5) % 2)
        assert not np.asarray(hashing.pixel_types(8, 8, 2, 5, False)).any()


class TestCensus:
    def test_blends_match_oracle(self):
        lr = RNG.integers(0, 255, size=(12, 14)).astype(np.float32)
        hr = lr + RNG.normal(size=(12, 14)).astype(np.float32) * 10
        rand = np.asarray(census.blend_randomness(jnp.asarray(lr), jnp.asarray(hr)))
        cobc = np.asarray(
            census.blend_count_of_bits_changed(jnp.asarray(lr), jnp.asarray(hr))
        )
        for r in range(1, 11):
            for c in range(1, 13):
                w = np_oracle.census_count(lr, r, c) / 8.0
                np.testing.assert_allclose(rand[r, c], w * hr[r, c] + (1 - w) * lr[r, c], rtol=1e-5)
                w2 = np_oracle.hamming(lr, hr, r, c) / 8.0
                np.testing.assert_allclose(cobc[r, c], w2 * lr[r, c] + (1 - w2) * hr[r, c], rtol=1e-5)


class TestFilterApply:
    def _random_bank(self, pixel_types):
        filters = np.zeros((216 * pixel_types, 128), dtype=np.float32)
        filters[:, :121] = RNG.normal(size=(216 * pixel_types, 121)).astype(np.float32) * 0.01
        filters[:, 60] += 1.0  # near-identity center tap
        return filters

    @pytest.mark.parametrize("pixel_types", [1, 4])
    def test_taps_matches_manual_dot(self, pixel_types):
        img = RNG.integers(0, 255, size=(28, 36)).astype(np.float32)
        filters = self._random_bank(pixel_types)
        idx = RNG.integers(0, 216 * pixel_types, size=(28, 36)).astype(np.int32)
        out = np.asarray(
            apply_filters_taps(jnp.asarray(img), jnp.asarray(idx), jnp.asarray(filters), 11)
        )
        pad = np.pad(img, 5)
        for r, c in [(6, 6), (13, 20), (21, 29)]:
            patch = pad[r : r + 11, c : c + 11].ravel()
            np.testing.assert_allclose(out[r, c], patch @ filters[idx[r, c], :121], rtol=1e-4)

    @pytest.mark.parametrize("pixel_types,ratio", [(1, 1), (4, 2)])
    def test_conv_matches_taps(self, pixel_types, ratio):
        img = RNG.integers(0, 255, size=(30, 38)).astype(np.float32)
        filters = self._random_bank(pixel_types)
        buckets = RNG.integers(0, 216, size=(30, 38)).astype(np.int32)
        if pixel_types == 4:
            rr = (np.arange(30)[:, None] - 5) % 2
            cc = (np.arange(38)[None, :] - 5) % 2
            pt = rr * 2 + cc
        else:
            pt = np.zeros((30, 38), np.int32)
        idx = buckets * pixel_types + pt
        ref = np.asarray(
            apply_filters_taps(jnp.asarray(img), jnp.asarray(idx), jnp.asarray(filters), 11)
        )
        out = np.asarray(
            apply_filters_conv(
                jnp.asarray(img),
                jnp.asarray(buckets),
                jnp.asarray(filters),
                11,
                pixel_types,
                5,
                ratio,
                chunk_rows=7,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_processed_col_end():
    # mirror of the AVX-512 unrolled loop bounds (Raisr.cpp:1066-1250)
    assert processed_col_end(3840, 6, True) == 3830
    assert processed_col_end(60, 6, True) == 54
    assert processed_col_end(61, 6, True) == 54
    assert processed_col_end(28, 6, True) == 22
    assert processed_col_end(27, 6, True) == 6  # < 16 usable cols: no work
    assert processed_col_end(3840, 6, False) == 3834
