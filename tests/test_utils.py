"""Direct tests for utils: metrics (PSNR/SSIM), tracer, log conventions."""

import numpy as np

from raisr_tpu.utils import metrics
from raisr_tpu.utils.profiler import Tracer


class TestMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((16, 16))
        b = np.full((16, 16), 16.0)  # mse = 256 -> psnr = 10*log10(255^2/256)
        expect = 10 * np.log10(255.0**2 / 256.0)
        assert abs(metrics.psnr(a, b, 255.0) - expect) < 1e-9

    def test_psnr_identical_is_inf(self):
        a = np.arange(64, dtype=np.float64).reshape(8, 8)
        assert metrics.psnr(a, a) == float("inf")

    def test_ssim_identical_is_one(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 255, (32, 32))
        assert abs(metrics.ssim(a, a, 255.0) - 1.0) < 1e-9

    def test_ssim_orders_degradations(self):
        """SSIM must rank a lightly-noised copy above a heavily-noised one."""
        rng = np.random.default_rng(1)
        x, y = np.meshgrid(np.arange(48), np.arange(48))
        img = 120 + 60 * np.sin(x / 5.0) + 40 * np.cos(y / 7.0)
        light = img + rng.normal(0, 2, img.shape)
        heavy = img + rng.normal(0, 25, img.shape)
        s_light = metrics.ssim(img, light, 255.0)
        s_heavy = metrics.ssim(img, heavy, 255.0)
        assert 1.0 > s_light > s_heavy > 0.0, (s_light, s_heavy)

    def test_psnr_peak_autodetect(self):
        a = np.full((8, 8), 900.0)  # >255 -> 10-bit peak
        b = a + 1.0
        expect = 10 * np.log10(1023.0**2 / 1.0)
        assert abs(metrics.psnr(a, b) - expect) < 1e-9


class TestTracer:
    def test_stage_timing_and_fps(self):
        import time

        tr = Tracer(enabled=True)
        for _ in range(3):
            with tr.stage("work"):
                time.sleep(0.01)
            tr.count_frame()
        rep = tr.report()
        assert rep["stages"]["work"]["count"] == 3
        assert rep["stages"]["work"]["mean_ms"] >= 5.0
        assert tr.fps > 0
        dump = tr.dump()
        assert "work" in dump
        tr.reset()
        assert tr.report()["stages"] == {}

    def test_disabled_tracer_is_noop(self):
        tr = Tracer(enabled=False)
        with tr.stage("x"):
            pass
        assert tr.report()["stages"] == {}


class TestLogging:
    def test_error_and_warning_prefixes(self, caplog):
        # assert on the records (the stream handler binds whatever
        # sys.stdout was at import time, which pytest may own)
        import logging as pylog

        from raisr_tpu.utils import logging as rlog

        with caplog.at_level(pylog.INFO, logger="raisr_tpu"):
            rlog.error("boom")
            rlog.warning("careful")
        msgs = [r.getMessage() for r in caplog.records]
        assert "[RAISR ERROR] boom" in msgs
        assert "[RAISR WARNING] careful" in msgs
