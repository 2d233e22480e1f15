"""16-bit end-to-end: train -> export -> load -> process -> Y4M round-trip.

The reference supports bitDepth=16 (always full range, Raisr.cpp:1462-1469)
but ships no 16-bit banks; this exercises the full 16-bit path with a bank
we train ourselves.
"""

import io
import os

import numpy as np
import pytest

from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import Frame, RaisrEngine
from raisr_tpu.model.loader import load_model
from raisr_tpu.train import TrainConfig
from raisr_tpu.train.trainer import train_filterbank
from raisr_tpu.train.export import save_filter_folder
from raisr_tpu import video


def _hr_image(h, w, rng):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = (20000 + 18000 * np.sin(x / 7.0) + 12000 * (y > h // 2)
           + rng.normal(0, 800, (h, w)))
    return np.clip(img, 0, 65535).astype(np.uint16)


@pytest.fixture(scope="module")
def bank16(tmp_path_factory):
    rng = np.random.default_rng(4)
    cfg = TrainConfig(bits=16, chunk=512)
    pairs = []
    for _ in range(2):
        hr = _hr_image(64, 80, rng)
        lr = np.clip(np.floor(
            hr.reshape(32, 2, 40, 2).mean(axis=(1, 3)) + 0.5), 0, 65535
        ).astype(np.uint16)
        pairs.append((lr, hr))
    bank = train_filterbank(pairs, cfg)
    folder = str(tmp_path_factory.mktemp("bank16"))
    save_filter_folder(folder, [bank], bits=16)
    return folder


def test_16bit_train_export_load_process(bank16):
    assert os.path.exists(os.path.join(bank16, "filterbin_2_16"))
    cfg = RaisrConfig(filterfolder=bank16, bits=16, backend="reference")
    model = load_model(bank16, cfg)
    assert model.banks[0].filters.shape[1] == 128

    rng = np.random.default_rng(9)
    y = _hr_image(40, 48, rng)
    eng = RaisrEngine(cfg)
    out = eng.process(Frame(y=y)).y
    assert out.shape == (80, 96)
    assert out.dtype == np.uint16
    # interior must actually be filtered (differ from the cheap upscale
    # somewhere) and stay in range
    assert out.max() <= 65535 and out.min() >= 0
    cheap = np.asarray(eng.upscale_uv(np.asarray(y, np.float32))).astype(np.uint16)
    assert (out != cheap).any()


def test_16bit_y4m_roundtrip(bank16, tmp_path):
    cfg = RaisrConfig(filterfolder=bank16, bits=16, backend="reference")
    eng = RaisrEngine(cfg)
    rng = np.random.default_rng(11)
    y = _hr_image(32, 48, rng)
    u = np.full((16, 24), 32768, np.uint16)

    src = os.path.join(str(tmp_path), "in16.y4m")
    fmt = video.VideoFormat(48, 32, 16, "420")
    wr = video.Y4MWriter(src, fmt)
    wr.write(Frame(y=y, u=u, v=u))
    wr.close()

    rd = video.Y4MReader(src)
    assert rd.fmt.bits == 16 and rd.fmt.subsampling == "420"
    frames = list(rd)
    rd.close()
    assert np.array_equal(frames[0].y, y)

    out = eng.process(frames[0])
    dst = os.path.join(str(tmp_path), "out16.y4m")
    wr = video.Y4MWriter(dst, rd.fmt.scaled(64, 96))
    wr.write(out)
    wr.close()
    rd2 = video.Y4MReader(dst)
    back = list(rd2)[0]
    rd2.close()
    assert np.array_equal(back.y, out.y)


def test_16bit_reference_binary_accepts_trained_bank(bank16, tmp_path):
    """The reference library itself must load and run our 16-bit bank
    (RNLInit bitDepth=16 path, Raisr.cpp:1462-1469)."""
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    harness = os.path.join(repo, "build", "refbuild", "ref_harness")
    if shutil.which("g++") is None or not os.path.isdir("/root/reference/Library"):
        pytest.skip("reference build unavailable")
    if not os.path.exists(harness):
        subprocess.run(
            [os.path.join(repo, "tools", "refbuild", "build_reference.sh")],
            check=True, capture_output=True, timeout=600,
        )
    rng = np.random.default_rng(13)
    w, h = 64, 48
    y = _hr_image(h, w, rng)
    u = np.full((h // 2, w // 2), 32768, np.uint16)
    inp = os.path.join(str(tmp_path), "in.yuv")
    outp = os.path.join(str(tmp_path), "out.yuv")
    with open(inp, "wb") as f:
        f.write(y.tobytes())
        f.write(u.tobytes())
        f.write(u.tobytes())
    r = subprocess.run(
        [harness, bank16, "2", "16", "2", "1", "2", "1", "1", "2",
         str(w), str(h), inp, outp],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]

    ref = np.frombuffer(
        open(outp, "rb").read()[: 2 * 4 * w * h], np.uint16
    ).reshape(2 * h, 2 * w).astype(int)
    cfg = RaisrConfig(filterfolder=bank16, bits=16, backend="reference")
    mine = RaisrEngine(cfg).process(Frame(y=y)).y.astype(int)
    d = np.abs(mine - ref)
    mse = float((d.astype(np.float64) ** 2).mean())
    psnr = 99.0 if mse == 0 else 10 * np.log10(65535.0 ** 2 / mse)
    assert psnr >= 55.0, (psnr, d.max())
