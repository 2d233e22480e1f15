"""Model-loader tests.

Positive cases verify bit-for-bit parsing of every shipped filter bank
(BASELINE.md requires "filter parsing matched bit-for-bit"); negative cases
mirror the reference's corrupt-model fixtures
(reference: test/validation_suite/create_wrong_files.sh).
"""

import os
import shutil
import struct

import numpy as np
import pytest

from raisr_tpu.config import RaisrConfig, RaisrError
from raisr_tpu.model.loader import load_model, parse_config_file


def _manual_parse_filterbin(path):
    """Independent reimplementation used as the test oracle."""
    with open(path, "rb") as f:
        raw = f.read()
    tag = raw[:4].decode()
    hashkey, ptypes, rows = struct.unpack_from("<III", raw, 4)
    dt = "<f4" if tag == "fp32" else "<f2"
    w = np.frombuffer(raw, dt, offset=16).astype(np.float32)
    return tag, hashkey, ptypes, rows, w.reshape(hashkey * ptypes, rows)


ALL_BANKS = [
    # (folder-under-reference, bits, passes, ratio)
    ("filters_2x/filters_lowres", 8, 2, 2.0),
    ("filters_2x/filters_lowres", 10, 1, 2.0),
    ("filters_2x/filters_highres", 8, 2, 2.0),
    ("filters_2x/filters_highres", 10, 2, 2.0),
    ("filters_2x/filters_denoise", 8, 2, 2.0),
    ("filters_2x/filters_denoise", 10, 2, 2.0),
    ("filters_1.5x/filters_highres", 8, 1, 1.5),
    ("filters_1.5x/filters_denoise", 8, 2, 1.5),
]


@pytest.mark.parametrize("rel,bits,passes,ratio", ALL_BANKS)
def test_loads_every_shipped_bank_bit_for_bit(reference_filters, rel, bits, passes, ratio):
    folder = str(reference_filters / rel)
    cfg = RaisrConfig(filterfolder=folder, bits=bits, passes=passes, ratio=ratio)
    model = load_model(folder, cfg)

    assert model.qangle == 24
    assert model.qstrength == 3
    assert model.qcoherence == 3
    assert model.patch_size == 11
    assert len(model.banks) == passes

    for pass_idx, bank in enumerate(model.banks):
        suffix = f"_{bits}" + ("_2" if pass_idx == 1 else "")
        tag, hashkey, ptypes, rows, w = _manual_parse_filterbin(
            os.path.join(folder, f"filterbin_2{suffix}")
        )
        assert bank.source_dtype == tag
        assert bank.hashkey_size == hashkey == 216
        assert bank.pixel_types == ptypes == int(ratio) * int(ratio)
        assert bank.taps == rows == 121
        # padded layout: [hashkey*ptypes, 128], first 121 taps bit-exact
        assert bank.filters.shape == (hashkey * ptypes, 128)
        np.testing.assert_array_equal(bank.filters[:, :121], w)
        assert not bank.filters[:, 121:].any()
        # Qfactor text files
        qstr = np.loadtxt(os.path.join(folder, f"Qfactor_strbin_2{suffix}"))
        qcoh = np.loadtxt(os.path.join(folder, f"Qfactor_cohbin_2{suffix}"))
        np.testing.assert_allclose(bank.qstr, qstr.astype(np.float32))
        np.testing.assert_allclose(bank.qcoh, qcoh.astype(np.float32))


def _copy_bank(tmp_path, src):
    dst = tmp_path / "bank"
    shutil.copytree(src, dst)
    return str(dst)


class TestRejections:
    """Mirrors create_wrong_files.sh + the loader's own validation branches."""

    def test_wrong_hashkey_config(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "config").write_text("12 3 3 11\n")
        with pytest.raises(RaisrError, match="hash keys"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_truncated_config(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "config").write_text("24 3 3\n")
        with pytest.raises(RaisrError, match="configFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    @pytest.mark.parametrize("patch", [6, 9])
    def test_unsupported_patch_size(self, tmp_path, filters_2x_highres, patch):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "config").write_text(f"24 3 3 {patch}\n")
        with pytest.raises(RaisrError, match="configFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_negative_config_value(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "config").write_text("-24 3 3 11\n")
        with pytest.raises(RaisrError, match="configFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    @pytest.mark.parametrize(
        "victim",
        ["config", "filterbin_2_8", "Qfactor_strbin_2_8", "Qfactor_cohbin_2_8"],
    )
    def test_missing_file(self, tmp_path, filters_2x_highres, victim):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        os.remove(tmp_path / "bank" / victim)
        with pytest.raises(RaisrError, match="Unable to"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_renamed_files_like_create_wrong_files(self, tmp_path, filters_2x_highres):
        # filters1_bad_hashtable_nums: filterbin_2_8 renamed to filterbin_6_8
        folder = _copy_bank(tmp_path, filters_2x_highres)
        os.rename(tmp_path / "bank" / "filterbin_2_8", tmp_path / "bank" / "filterbin_6_8")
        with pytest.raises(RaisrError, match="Unable to load model"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_truncated_filterbin(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        p = tmp_path / "bank" / "filterbin_2_8"
        p.write_bytes(p.read_bytes()[:-8])
        with pytest.raises(RaisrError, match="hashtable corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_bad_dtype_tag(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        p = tmp_path / "bank" / "filterbin_2_8"
        raw = bytearray(p.read_bytes())
        raw[:4] = b"fp64"
        p.write_bytes(bytes(raw))
        with pytest.raises(RaisrError, match="hashtable corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_wrong_pixel_types_for_ratio(self, tmp_path, filters_2x_highres):
        # 2x bank (pixelTypes=4) loaded at ratio 1.5 (expects 1)
        folder = _copy_bank(tmp_path, filters_2x_highres)
        cfg = RaisrConfig(filterfolder=folder, ratio=1.5)
        with pytest.raises(RaisrError, match="pixel types"):
            load_model(folder, cfg)

    def test_qfactor_bad_chars(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "Qfactor_strbin_2_8").write_text("0.001269\nabc\n")
        with pytest.raises(RaisrError, match="StrFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_qfactor_double_dot(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "Qfactor_cohbin_2_8").write_text("0.19.2916\n0.405942\n")
        with pytest.raises(RaisrError, match="CohFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))

    def test_qfactor_wrong_count(self, tmp_path, filters_2x_highres):
        folder = _copy_bank(tmp_path, filters_2x_highres)
        (tmp_path / "bank" / "Qfactor_strbin_2_8").write_text("0.001269\n0.022169\n0.5\n")
        with pytest.raises(RaisrError, match="StrFile corrupted"):
            load_model(folder, RaisrConfig(filterfolder=folder))


class TestConfigValidation:
    """RNLInit argument validation (reference: Raisr.cpp:1429-1474)."""

    def test_bad_passes(self):
        with pytest.raises(RaisrError, match="passes 1 or 2"):
            RaisrConfig(passes=3)

    def test_bad_bits(self):
        with pytest.raises(RaisrError, match="NOT supported"):
            RaisrConfig(bits=9)

    def test_bad_blending(self):
        with pytest.raises(RaisrError):
            RaisrConfig(blending=0)

    def test_dtype_auto_selects_production_fast_tier(self):
        """dtype=auto mirrors RNLInit's ISA auto-pick (Raisr.cpp:1492-1501,
        FP16 first): resolves to the bf16-class tier at every bit depth."""
        assert RaisrConfig(dtype="auto").dtype == "bfloat16"
        assert RaisrConfig(dtype="auto", bits=10).dtype == "bfloat16"
        assert RaisrConfig(dtype="auto", ratio=1.5).dtype == "bfloat16"
        with pytest.raises(RaisrError, match="NOT supported"):
            RaisrConfig(dtype="float16")

    def test_int8_requires_8bit_ratio2(self):
        with pytest.raises(RaisrError, match="8-bit"):
            RaisrConfig(dtype="int8", bits=10)
        with pytest.raises(RaisrError, match="ratio 2"):
            RaisrConfig(dtype="int8", ratio=1.5)

    def test_bad_mode(self):
        with pytest.raises(RaisrError):
            RaisrConfig(mode=-1)

    def test_mode2_with_one_pass_warns(self, filters_2x_highres):
        cfg = RaisrConfig(filterfolder=filters_2x_highres, passes=1, mode=2)
        with pytest.warns(UserWarning, match="RAISR WARNING"):
            load_model(filters_2x_highres, cfg)

    def test_evenoutput(self):
        cfg = RaisrConfig(ratio=1.5, evenoutput=True)
        assert cfg.output_size(481, 641) == (720, 960)
        cfg = RaisrConfig(ratio=1.5, evenoutput=False)
        assert cfg.output_size(481, 641) == (721, 961)
