"""Cheap-upscale resampler modes (RaisrConfig.resize_mode).

The reference compile-selects its resizer: bilinear default, cubic
(B=0, C=0.75 — "the value OpenCV is using", Raisr.cpp:458-473) or 3-lobe
Lanczos (USE_BICUBIC/USE_LANCZOS, Raisr_globals.h:63-81). Here the same
three resamplers are a runtime knob sharing the half-pixel mapping and
border-replicate semantics; these tests pin the kernels against an
explicit per-pixel numpy oracle and the engine wiring end-to-end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raisr_tpu.config import RaisrConfig, RaisrError
from raisr_tpu.engine import RaisrEngine
from raisr_tpu.ops.resize import (
    _cubic_kernel,
    _lanczos3_kernel,
    bilinear_upscale,
    resample_upscale,
)

FOLDER = "/root/reference/filters_2x/filters_highres"


def _oracle(img: np.ndarray, out_h: int, out_w: int, kern, support: int):
    """Direct per-pixel separable resample: half-pixel mapping, border
    replicate, per-pixel weight normalization."""
    def axis(v, out_size):
        in_size = v.shape[0]
        res = np.zeros((out_size,) + v.shape[1:], np.float64)
        for i in range(out_size):
            src = (i + 0.5) * (in_size / out_size) - 0.5
            lo = int(np.floor(src)) - support + 1
            ws, acc = 0.0, 0.0
            for j in range(lo, lo + 2 * support):
                w = float(kern(np.asarray([src - j]))[0])
                ws += w
                acc = acc + w * v[min(max(j, 0), in_size - 1)]
            res[i] = acc / ws
        return res

    return axis(axis(img.astype(np.float64), out_h).T, out_w).T


class TestKernels:
    def test_cubic_matches_oracle(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (9, 13)).astype(np.float32)
        out = np.asarray(resample_upscale(jnp.asarray(img), 18, 26, "cubic"))
        exp = _oracle(img, 18, 26, _cubic_kernel, 2)
        np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-3)

    def test_lanczos_matches_oracle(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (10, 12)).astype(np.float32)
        out = np.asarray(
            resample_upscale(jnp.asarray(img), 15, 18, "lanczos")
        )
        exp = _oracle(img, 15, 18, _lanczos3_kernel, 3)
        np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-3)

    def test_constant_preserved_exactly(self):
        img = jnp.full((8, 8), 127.0)
        for mode in ("cubic", "lanczos"):
            out = np.asarray(resample_upscale(img, 16, 12, mode))
            np.testing.assert_allclose(out, 127.0, atol=1e-4)

    def test_flip_symmetry(self):
        # even kernels + the half-pixel mapping commute with flips (note the
        # C=0.75 cubic, unlike Catmull-Rom, does NOT reproduce linear ramps
        # — the oracle tests pin its actual values)
        rng = np.random.default_rng(6)
        img = rng.uniform(0, 255, (12, 10)).astype(np.float32)
        for mode in ("cubic", "lanczos"):
            out = np.asarray(resample_upscale(jnp.asarray(img), 24, 20, mode))
            flipped = np.asarray(
                resample_upscale(jnp.asarray(img[::-1, ::-1].copy()), 24, 20, mode)
            )
            np.testing.assert_allclose(out, flipped[::-1, ::-1], atol=1e-3)

    def test_bilinear_mode_is_the_default_path(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 255, (7, 9)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(resample_upscale(img, 14, 18, "bilinear")),
            np.asarray(bilinear_upscale(img, 14, 18)),
        )


class TestEngineWiring:
    def _plane(self, h=24, w=32, seed=3):
        # smooth content + mild noise: resamplers should nearly agree here
        # (pure noise exaggerates their frequency-response differences)
        rng = np.random.default_rng(seed)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        img = 120 + 60 * np.sin(x / 5.0) + 40 * np.cos(y / 4.0)
        return np.clip(img + rng.normal(0, 3, (h, w)), 16, 235).astype(
            np.float32
        )

    def test_modes_differ_but_agree_closely(self):
        y = self._plane()
        outs = {}
        for mode in ("bilinear", "cubic", "lanczos"):
            eng = RaisrEngine(RaisrConfig(
                filterfolder=FOLDER, backend="reference", resize_mode=mode))
            outs[mode] = np.asarray(eng.upscale_y(jnp.asarray(y)))
        assert not np.array_equal(outs["bilinear"], outs["cubic"])
        assert not np.array_equal(outs["cubic"], outs["lanczos"])
        for mode in ("cubic", "lanczos"):
            mse = np.mean((outs[mode] - outs["bilinear"]) ** 2)
            psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
            assert psnr > 25.0, (mode, psnr)

    def test_uv_mode_wiring(self):
        uv = self._plane(12, 16, seed=4)
        eng_b = RaisrEngine(RaisrConfig(filterfolder=FOLDER,
                                        backend="reference"))
        eng_c = RaisrEngine(RaisrConfig(filterfolder=FOLDER,
                                        backend="reference",
                                        resize_mode="cubic"))
        a = np.asarray(eng_b.upscale_uv(jnp.asarray(uv)))
        b = np.asarray(eng_c.upscale_uv(jnp.asarray(uv)))
        assert a.shape == b.shape == (24, 32)
        assert not np.array_equal(a, b)

    def test_batch_matches_per_frame_cubic(self):
        eng = RaisrEngine(RaisrConfig(filterfolder=FOLDER,
                                      backend="reference",
                                      resize_mode="cubic"))
        rng = np.random.default_rng(5)
        batch = jnp.asarray(
            rng.integers(16, 235, (3, 24, 32)).astype(np.float32))
        out = np.asarray(eng.process_batch_y(batch))
        ref = np.stack([np.asarray(eng.upscale_y(batch[i])) for i in range(3)])
        np.testing.assert_array_equal(out, ref)
        uv_batch = jnp.asarray(
            rng.integers(16, 240, (3, 12, 16)).astype(np.float32))
        out_uv = np.asarray(eng.process_batch_uv(uv_batch))
        ref_uv = np.stack(
            [np.asarray(eng.upscale_uv(uv_batch[i])) for i in range(3)])
        np.testing.assert_array_equal(out_uv, ref_uv)

    def test_bad_mode_rejected(self):
        with pytest.raises(RaisrError):
            RaisrConfig(filterfolder=FOLDER, resize_mode="bicubic")

    def test_shard_plus_nonbilinear_rejected(self):
        with pytest.raises(RaisrError):
            RaisrEngine(
                RaisrConfig(filterfolder=FOLDER, resize_mode="cubic"),
                shard="data=2",
            )
