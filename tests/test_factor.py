"""model/factor.py: low-rank structure of the shipped filter banks.

The reference trainer solves each bucket's 121-tap filter from patch
statistics (reference Raisr.cpp ReadTrainedData consumers load the result);
the first-pass banks it ships are EXACTLY low-rank (rank <= 64), which
factor_filters detects and exploits. These tests pin that structural fact
and the factorization contract (reconstruction at the f32 noise floor,
None for full-rank tables).
"""

import numpy as np
import pytest

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.factor import RANK, factor_filters
from raisr_tpu.model.loader import load_model


@pytest.fixture(scope="module")
def highres_banks(reference_filters):
    folder = str(reference_filters / "filters_2x/filters_highres")
    cfg = RaisrConfig(filterfolder=folder, passes=2)
    return load_model(folder, cfg).banks


def test_first_pass_bank_is_low_rank(highres_banks):
    f = np.asarray(highres_banks[0].filters)
    fac = factor_filters(f)
    assert fac is not None, "shipped first-pass bank should be rank <= 64"
    c, b = fac
    assert c.shape == (f.shape[0], RANK)
    assert b.shape == (RANK, 121)
    rec = c.astype(np.float64) @ b.astype(np.float64)
    err = np.abs(rec - f[:, :121]).max()
    assert err < 1e-5 * np.abs(f).max()


def test_second_pass_bank_is_full_rank(highres_banks):
    f = np.asarray(highres_banks[1].filters)
    assert factor_filters(f) is None, "second-pass bank is full-rank"


def test_factor_rejects_above_tolerance():
    rng = np.random.default_rng(0)
    full = rng.normal(size=(256, 121)).astype(np.float32)
    assert factor_filters(full, rank=64) is None


def test_factor_zero_table():
    assert factor_filters(np.zeros((32, 128), np.float32)) is None
