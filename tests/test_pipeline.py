"""End-to-end pass/pipeline tests against the NumPy oracle.

Tolerances: the jnp pipeline computes the structure tensor via f32 convs
while the oracle uses f64 window sums; buckets can flip for pixels whose
(strength, coherence, angle) land exactly on a bin edge, changing the chosen
filter. We therefore require an overwhelming majority of exactly-equal output
pixels rather than bitwise equality.
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

import np_oracle
from raisr_tpu.config import RaisrConfig, BlendingMode

pytestmark = pytest.mark.skipif(
    not pathlib.Path("/root/reference").exists(),
    reason="reference filter banks not available",
)
from raisr_tpu.engine import RaisrEngine, Frame
from raisr_tpu.model.gaussian import gaussian_weights
from raisr_tpu.model.loader import load_model
from raisr_tpu.ops.pipeline import pass_statics, raisr_pass

RNG = np.random.default_rng(42)


def _smooth_image(h, w, bits, seed=0):
    """Natural-ish test image: smoothed random field (reduces bin-edge ties
    versus white noise while exercising all gradient orientations)."""
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w))
    k = np.ones(5) / 5.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return np.floor(img * ((1 << bits) - 1)).astype(np.float32)


def _compare(ours, oracle, max_frac=0.01, max_abs=None, bits=8):
    ours, oracle = np.asarray(ours), np.asarray(oracle)
    diff = np.abs(ours - oracle)
    frac = (diff > 0).mean()
    assert frac <= max_frac, f"{frac:.4%} pixels differ (max {diff.max()})"
    if max_abs is not None:
        # differing pixels should differ because of a bucket flip; even then
        # the blended result stays close
        assert np.quantile(diff, 0.9999) <= max_abs or diff.max() <= max_abs


@pytest.fixture(scope="module")
def bank_2x(filters_2x_highres_mod):
    return filters_2x_highres_mod


@pytest.fixture(scope="module")
def filters_2x_highres_mod():
    return "/root/reference/filters_2x/filters_highres"


class TestSinglePass:
    @pytest.mark.parametrize("blending", [1, 2])
    @pytest.mark.parametrize("backend", ["taps", "conv"])
    def test_pass_matches_oracle_2x(self, bank_2x, blending, backend):
        cfg = RaisrConfig(
            filterfolder=bank_2x, blending=BlendingMode(blending), passes=1
        )
        model = load_model(bank_2x, cfg)
        bank = model.banks[0]
        statics = pass_statics(cfg, model, backend)

        lr = _smooth_image(24, 32, 8)
        cheap = np_oracle.cheap_upscale(lr, 48, 64, 8)
        weights = gaussian_weights(11, 8).astype(np.float64)

        oracle = np_oracle.raisr_pass(
            cheap, bank.filters, bank.qstr, bank.qcoh, weights,
            bank.pixel_types, 2, cfg.min_val, cfg.max_val, blending,
        )
        ours = raisr_pass(
            jnp.asarray(cheap),
            jnp.asarray(bank.filters),
            jnp.asarray(bank.qstr),
            jnp.asarray(bank.qcoh),
            statics,
        )
        _compare(ours, oracle, max_frac=0.01, max_abs=64)

    def test_pass_matches_oracle_15x(self):
        folder = "/root/reference/filters_1.5x/filters_highres"
        cfg = RaisrConfig(filterfolder=folder, ratio=1.5, passes=1)
        model = load_model(folder, cfg)
        bank = model.banks[0]
        statics = pass_statics(cfg, model, "taps")
        assert not statics.use_pixel_type

        lr = _smooth_image(24, 32, 8, seed=3)
        cheap = np_oracle.cheap_upscale(lr, 36, 48, 8)
        weights = gaussian_weights(11, 8).astype(np.float64)
        oracle = np_oracle.raisr_pass(
            cheap, bank.filters, bank.qstr, bank.qcoh, weights,
            1, 1, cfg.min_val, cfg.max_val, 2,
        )
        ours = raisr_pass(
            jnp.asarray(cheap),
            jnp.asarray(bank.filters),
            jnp.asarray(bank.qstr),
            jnp.asarray(bank.qcoh),
            statics,
        )
        _compare(ours, oracle, max_frac=0.01, max_abs=64)


class TestEngine:
    def test_engine_full_frame_8bit(self, filters_2x_highres_mod):
        cfg = RaisrConfig(filterfolder=filters_2x_highres_mod, passes=1)
        eng = RaisrEngine(cfg)
        y = _smooth_image(24, 32, 8).astype(np.uint8)
        u = _smooth_image(12, 16, 8, seed=7).astype(np.uint8)
        v = _smooth_image(12, 16, 8, seed=8).astype(np.uint8)
        out = eng.process(Frame(y=y, u=u, v=v))
        assert out.y.shape == (48, 64) and out.y.dtype == np.uint8
        assert out.u.shape == (24, 32) and out.v.shape == (24, 32)
        # UV is the cheap upscale
        _compare(out.u, np_oracle.cheap_upscale(u.astype(np.float32), 24, 32, 8),
                 max_frac=0.005)

    def test_engine_10bit(self, filters_2x_highres_mod):
        cfg = RaisrConfig(filterfolder=filters_2x_highres_mod, bits=10, passes=1)
        eng = RaisrEngine(cfg)
        y = _smooth_image(24, 32, 10).astype(np.uint16)
        out = eng.process(Frame(y=y))
        assert out.y.dtype == np.uint16
        assert out.y.max() <= 940 or out.y.max() <= y.max()

    def test_two_pass_mode1_uses_second_bank(self, filters_2x_highres_mod):
        cfg1 = RaisrConfig(filterfolder=filters_2x_highres_mod, passes=1)
        cfg2 = RaisrConfig(filterfolder=filters_2x_highres_mod, passes=2, mode=1)
        y = _smooth_image(24, 32, 8).astype(np.uint8)
        out1 = RaisrEngine(cfg1).process(Frame(y=y)).y
        out2 = RaisrEngine(cfg2).process(Frame(y=y)).y
        assert out1.shape == out2.shape == (48, 64)
        assert (out1 != out2).any()  # second sharpening pass changes pixels

    def test_two_pass_mode2_denoise_shape(self):
        folder = "/root/reference/filters_2x/filters_denoise"
        cfg = RaisrConfig(filterfolder=folder, passes=2, mode=2)
        y = _smooth_image(24, 32, 8).astype(np.uint8)
        out = RaisrEngine(cfg).process(Frame(y=y)).y
        assert out.shape == (48, 64)

    def test_two_pass_oracle_mode1(self, filters_2x_highres_mod):
        cfg = RaisrConfig(filterfolder=filters_2x_highres_mod, passes=2, mode=1)
        model = load_model(filters_2x_highres_mod, cfg)
        y = _smooth_image(20, 24, 8)
        weights = gaussian_weights(11, 8).astype(np.float64)

        cheap = np_oracle.cheap_upscale(y, 40, 48, 8)
        b0, b1 = model.banks
        inter = np_oracle.raisr_pass(
            cheap, b0.filters, b0.qstr, b0.qcoh, weights, 4, 2, 16, 235, 2
        )
        oracle = np_oracle.raisr_pass(
            inter, b1.filters, b1.qstr, b1.qcoh, weights, 4, 2, 16, 235, 2
        )
        ours = RaisrEngine(cfg).process(Frame(y=y.astype(np.uint8))).y
        # two chained passes compound bucket-flip divergence slightly
        _compare(ours, oracle, max_frac=0.02, max_abs=64)

    @pytest.mark.slow
    def test_explicit_pallas_backend_interprets_off_tpu(
        self, filters_2x_highres_mod
    ):
        """--backend pallas on a non-TPU host must run the Mosaic kernels
        interpreted (and produce output) instead of failing in lowering."""
        cfg = RaisrConfig(filterfolder=filters_2x_highres_mod, passes=1,
                          backend="pallas")
        eng = RaisrEngine(cfg)
        assert eng._statics.backend_interpret  # conftest forces CPU
        y = _smooth_image(24, 32, 8).astype(np.uint8)
        out = eng.process(Frame(y=y))
        assert out.y.shape == (48, 64) and out.y.dtype == np.uint8

    def test_full_vs_exact_edges(self, filters_2x_highres_mod):
        y = _smooth_image(24, 31, 8).astype(np.uint8)  # odd width: ragged edge
        cfg_e = RaisrConfig(filterfolder=filters_2x_highres_mod, exact_edges=True)
        cfg_f = RaisrConfig(filterfolder=filters_2x_highres_mod, exact_edges=False)
        out_e = RaisrEngine(cfg_e).process(Frame(y=y)).y
        out_f = RaisrEngine(cfg_f).process(Frame(y=y)).y
        # identical except near the ragged right edge
        assert np.array_equal(out_e[:, :48], out_f[:, :48])


def test_device_resident_composition():
    """The zero-copy analogue of the reference's OpenCL hw-frames path
    (vf_raisr_opencl consumes/produces device-side frames without host
    round-trips): engine.upscale_y / process_batch_y accept and return
    device arrays, so decode->upscale->postprocess chains stay on device.
    Verify no host materialization is required between stages and that a
    composed jit consumes the output directly."""
    import jax
    import jax.numpy as jnp

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import RaisrEngine

    cfg = RaisrConfig(
        filterfolder="/root/reference/filters_2x/filters_lowres",
        backend="reference",
    )
    eng = RaisrEngine(cfg)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.integers(16, 235, (20, 28)).astype(np.float32))
    up = eng.upscale_y(y)
    assert isinstance(up, jax.Array)

    # compose a downstream device-side stage without leaving the device
    post = jax.jit(lambda a: jnp.clip(a * 0.5 + 10.0, 0, 255))(up)
    assert isinstance(post, jax.Array)
    np.testing.assert_allclose(
        np.asarray(post), np.clip(np.asarray(up) * 0.5 + 10.0, 0, 255)
    )

    # and the whole chain can live under ONE jit (no intermediate dispatch)
    from raisr_tpu.ops.pipeline import process_plane_y

    def chain(lr):
        o = process_plane_y(
            lr, eng._filters, eng._qstr, eng._qcoh, eng._statics,
            cfg.passes, cfg.two_pass_mode, 40, 56,
        )
        return jnp.mean(o)

    val = jax.jit(chain)(y)
    assert np.isfinite(float(val))
