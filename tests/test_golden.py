"""Golden regression tests: frozen expected outputs for representative
configs (2x/1.5x, 8/10-bit, 1/2-pass, both blend modes). Guards the exact
reference semantics against silent drift. Regenerate via the snippet in the
fixtures' git history only when a semantic change is *intended*."""

import glob
import os
import pathlib

import numpy as np
import pytest

from raisr_tpu.config import RaisrConfig, BlendingMode
from raisr_tpu.engine import RaisrEngine, Frame

pytestmark = pytest.mark.skipif(
    not pathlib.Path("/root/reference").exists(),
    reason="reference filter banks not available",
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "2x_highres_p2_b2_8bit": dict(
        folder="/root/reference/filters_2x/filters_highres",
        ratio=2.0, bits=8, passes=2, mode=1, blending=2,
    ),
    "2x_lowres_p1_b1_8bit": dict(
        folder="/root/reference/filters_2x/filters_lowres",
        ratio=2.0, bits=8, passes=1, mode=1, blending=1,
    ),
    "2x_denoise_p2m2_10bit": dict(
        folder="/root/reference/filters_2x/filters_denoise",
        ratio=2.0, bits=10, passes=2, mode=2, blending=2,
    ),
    "15x_highres_p1_8bit": dict(
        folder="/root/reference/filters_1.5x/filters_highres",
        ratio=1.5, bits=8, passes=1, mode=1, blending=2,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    c = CASES[name]
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    cfg = RaisrConfig(
        filterfolder=c["folder"], ratio=c["ratio"], bits=c["bits"],
        passes=c["passes"], mode=c["mode"], blending=BlendingMode(c["blending"]),
    )
    out = RaisrEngine(cfg).process(Frame(y=data["lr"])).y
    np.testing.assert_array_equal(out, data["expected"])
