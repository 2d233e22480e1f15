"""C ABI tests: the capi_bridge (python side) directly, plus the compiled
shared library when a toolchain is available."""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from raisr_tpu import capi_bridge

FOLDER = "/root/reference/filters_2x/filters_lowres"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBridge:
    def test_init_process_deinit(self):
        assert capi_bridge.init(FOLDER, 2.0, 8, 0, 1, 1) == 0
        h, w = 24, 32
        rng = np.random.default_rng(0)
        in_y = np.ascontiguousarray(rng.integers(16, 235, (h, w)).astype(np.uint8))
        out_y = np.zeros((2 * h, 2 * w), np.uint8)
        rc = capi_bridge.process(
            (in_y.ctypes.data, w, h, w),
            None, None,
            (out_y.ctypes.data, 2 * w, 2 * h, 2 * w),
            None, None,
            2,
        )
        assert rc == 0
        assert out_y.sum() > 0
        assert capi_bridge.deinit() == 0

    def test_bad_model_path(self):
        assert capi_bridge.init("/nonexistent", 2.0, 8, 0, 1, 1) == 1

    def test_process_before_init(self):
        capi_bridge.deinit()
        assert capi_bridge.process(None, None, None, None, None, None, 2) == 1


@pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("cc") is None,
    reason="native toolchain unavailable",
)
def test_shared_library_smoke():
    lib = os.path.join(REPO, "build", "capi", "libraisr_tpu.so")
    smoke = os.path.join(REPO, "build", "capi", "capi_smoke")
    if not (os.path.exists(lib) and os.path.exists(smoke)):
        subprocess.run(
            [os.path.join(REPO, "tools", "build_capi.sh")],
            check=True, capture_output=True, timeout=600,
        )
        return  # build_capi.sh already ran the smoke test
    env = dict(os.environ, JAX_PLATFORMS="cpu", LD_LIBRARY_PATH=os.path.dirname(lib))
    r = subprocess.run([smoke], env=env, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-500:]
