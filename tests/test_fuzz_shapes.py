"""Awkward-shape hardening: the fused whole-pass kernels vs the exact taps
pipeline on odd/tiny/boundary shapes.

The reference accepts any WxH >= 16 (Raisr.cpp RNLProcess validates only
against the patch margin); shape edge cases are where fused-kernel bugs
hide (round-2 advisor finding: a staging overrun reachable only at tb2=8,
i.e. wide planes). These run the engine end-to-end (resize + zones +
ragged edges + kernel) in interpret mode on CPU.
"""

import numpy as np
import pytest

from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import RaisrEngine, Frame

FOLDER2 = "/root/reference/filters_2x/filters_highres"
FOLDER15 = "/root/reference/filters_1.5x/filters_highres"


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, 40, (h, w)), 16, 235).round().astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,ratio,passes",
    [
        pytest.param(23, 31, 2.0, 2, marks=pytest.mark.slow),
        # ^ odd both dims, tiny (band clamp, ragged edge); 2-pass = heaviest
        pytest.param(17, 129, 2.0, 1, marks=pytest.mark.slow),
        # ^ shallow and wide-ish, odd width
        (22, 34, 1.5, 1),   # single-phase kernel, non-multiple-of-16 dims
        (16, 16, 2.0, 1),   # minimum square
        (20, 4700, 2.0, 1),  # w > 4608 AND HR h=40 -> tb2 clamp 24: the
        # wide-plane band config (tb2=24, rowbatch=2) actually runs in
        # interpret mode here (a 12-row case clamps tb2 to 16 and misses it)
    ],
)
def test_fused_kernel_awkward_shapes_match_taps(h, w, ratio, passes):
    folder = FOLDER2 if ratio == 2.0 else FOLDER15
    y = _img(h, w, seed=h * 100 + w)
    outs = {}
    for backend in ("pallas", "reference"):
        cfg = RaisrConfig(filterfolder=folder, ratio=ratio, passes=passes,
                          backend=backend)
        outs[backend] = RaisrEngine(cfg).process(Frame(y=y)).y
    a, b = outs["pallas"].astype(int), outs["reference"].astype(int)
    assert a.shape == b.shape == (int(h * ratio), int(w * ratio))
    d = np.abs(a - b)
    # identical up to rare fp-tie hash-bucket flips (cf. docs/PARITY.md)
    assert (d > 0).mean() < 0.02, ((d > 0).mean(), d.max())
    assert np.median(d) == 0.0


@pytest.mark.slow
def test_fast_tier_awkward_shape_runs():
    """The 10-bit fast tier (centered single-slot since round 5) on an odd
    shape: shape/dtype sanity (quality is covered by test_reference_parity
    fast10_centered / tpu_check)."""
    import shutil

    import tempfile

    with tempfile.TemporaryDirectory() as folder:
        for name in ("filterbin_2_8", "Qfactor_strbin_2_8",
                     "Qfactor_cohbin_2_8"):
            shutil.copy(f"{FOLDER2}/{name}",
                        f"{folder}/{name.replace('_8', '_10')}")
        shutil.copy(f"{FOLDER2}/config", f"{folder}/config")
        cfg = RaisrConfig(filterfolder=folder, bits=10, dtype="bfloat16",
                          passes=1, backend="pallas")
        eng = RaisrEngine(cfg)
    rng = np.random.default_rng(9)
    y = np.clip(rng.normal(470, 150, (19, 27)), 64, 940).round().astype(np.uint16)
    out = eng.process(Frame(y=y)).y
    assert out.shape == (38, 54) and out.dtype == np.uint16
    assert out.min() >= 64 and out.max() <= 940


@pytest.mark.slow
def test_vconv_mxu_ablation_matches_taps():
    """RAISR_ABLATE=vconv_mxu (vertical tensor conv as a banded-matrix MXU
    matmul — measured -6.9% mxu1 / -1.2% mxu2 on hardware but DEFAULT OFF:
    the MXU's position-dependent conv rounding breaks batched-stack
    bit-identity and grows hardware parity drift; see full_kernel.py) must
    still match the taps pipeline in interpret mode. Runs in a subprocess
    because the flag is read at module import."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import RaisrEngine
rng = np.random.default_rng(3)
y = np.clip(rng.normal(128, 40, (23, 31)), 16, 235).round().astype(np.uint8)
outs = {}
for backend in ("pallas", "reference"):
    eng = RaisrEngine(RaisrConfig(
        filterfolder="/root/reference/filters_2x/filters_highres",
        passes=1, backend=backend))
    outs[backend] = np.asarray(eng.upscale_y(jnp.asarray(y, jnp.float32)))
d = np.abs(outs["pallas"].astype(int) - outs["reference"].astype(int))
assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())
print("VCONV_OK")
"""
    env = dict(os.environ, RAISR_ABLATE="vconv_mxu", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       env=env, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert b"VCONV_OK" in r.stdout
