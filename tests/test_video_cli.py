"""Video I/O + CLI end-to-end tests (mirrors the reference's e2e validation
sweep style, test/validation_suite/run_tests_avxout.sh, against our CLI)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from raisr_tpu import video
from raisr_tpu.cli import main as cli_main
from raisr_tpu.engine import Frame

FOLDER = "/root/reference/filters_2x/filters_highres"


def _write_y4m(path, n_frames=2, w=32, h=24, bits=8, subsampling="420"):
    fmt = video.VideoFormat(w, h, bits, subsampling)
    wr = video.Y4MWriter(str(path), fmt)
    rng = np.random.default_rng(0)
    dt = np.uint8 if bits == 8 else np.uint16
    frames = []
    for _ in range(n_frames):
        y = rng.integers(16, 235, size=(h, w)).astype(dt)
        if subsampling == "mono":
            f = Frame(y=y)
        else:
            sv, sh = {"420": (2, 2), "422": (1, 2), "444": (1, 1)}[subsampling]
            u = rng.integers(16, 240, size=(h // sv, w // sh)).astype(dt)
            v = rng.integers(16, 240, size=(h // sv, w // sh)).astype(dt)
            f = Frame(y=y, u=u, v=v)
        wr.write(f)
        frames.append(f)
    wr.close()
    return fmt, frames


class TestY4M:
    @pytest.mark.parametrize("subsampling", ["420", "422", "444", "mono"])
    @pytest.mark.parametrize("bits", [8, 10])
    def test_roundtrip(self, tmp_path, subsampling, bits):
        if subsampling == "mono" and bits == 10:
            pytest.skip("mono10 tag not defined")
        path = tmp_path / "clip.y4m"
        fmt, frames = _write_y4m(path, 2, 32, 24, bits, subsampling)
        rd = video.Y4MReader(str(path))
        assert rd.fmt.width == 32 and rd.fmt.height == 24
        assert rd.fmt.bits == bits and rd.fmt.subsampling == subsampling
        got = list(rd)
        assert len(got) == 2
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a.y, b.y)
            if b.u is not None:
                np.testing.assert_array_equal(a.u, b.u)

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.y4m"
        p.write_bytes(b"not a y4m stream\n")
        with pytest.raises(Exception, match="Y4M"):
            video.Y4MReader(str(p))


class TestCLI:
    def test_upscale_y4m(self, tmp_path):
        src = tmp_path / "in.y4m"
        dst = tmp_path / "out.y4m"
        _write_y4m(src, 2, 32, 24)
        rc = cli_main(
            ["upscale", "-i", str(src), "-o", str(dst), "--filterfolder", FOLDER]
        )
        assert rc == 0
        rd = video.Y4MReader(str(dst))
        assert (rd.fmt.width, rd.fmt.height) == (64, 48)
        assert len(list(rd)) == 2

    def test_upscale_stdin_stdout_pipe(self, tmp_path):
        """`raisr upscale -i - -o -` streams Y4M through stdin/stdout (the
        ffmpeg-pipeline composition surface) byte-identically to the file
        path, keeping the pipe clean (status line on stderr)."""
        import os
        import sys

        src = tmp_path / "in.y4m"
        dst = tmp_path / "out.y4m"
        _write_y4m(src, 2, 32, 24)
        rc = cli_main(
            ["upscale", "-i", str(src), "-o", str(dst),
             "--filterfolder", FOLDER]
        )
        assert rc == 0
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        r = subprocess.run(
            [sys.executable, "-m", "raisr_tpu.cli", "upscale", "-i", "-",
             "-o", "-", "--filterfolder", FOLDER],
            stdin=open(src, "rb"), capture_output=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        assert b"processed 2 frames" in r.stderr  # status stays off the pipe
        assert r.stdout == dst.read_bytes()

    def test_upscale_raw_yuv(self, tmp_path):
        src = tmp_path / "in.yuv"
        dst = tmp_path / "out.yuv"
        rng = np.random.default_rng(1)
        h, w = 24, 32
        data = rng.integers(0, 255, size=(h * w * 3 // 2,)).astype(np.uint8)
        src.write_bytes(data.tobytes())
        rc = cli_main(
            ["upscale", "-i", str(src), "-o", str(dst), "--size", "32x24",
             "--filterfolder", FOLDER]
        )
        assert rc == 0
        assert dst.stat().st_size == (48 * 64 * 3 // 2)

    def test_upscale_png(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        src = tmp_path / "in.png"
        dst = tmp_path / "out.png"
        rng = np.random.default_rng(2)
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(src)
        rc = cli_main(
            ["upscale", "-i", str(src), "-o", str(dst), "--filterfolder", FOLDER,
             "--range", "full"]
        )
        assert rc == 0
        assert Image.open(dst).size == (64, 48)

    def test_info(self, capsys):
        rc = cli_main(["info", "--filterfolder", FOLDER, "--passes", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert '"qangle": 24' in out and '"passes": 2' in out

    def test_bad_filterfolder_fails_like_reference(self, tmp_path, capsys):
        rc = cli_main(
            ["info", "--filterfolder", str(tmp_path / "nonexistent")]
        )
        assert rc == 1
        assert "[RAISR ERROR]" in capsys.readouterr().err

    def test_evenoutput_15x(self, tmp_path):
        src = tmp_path / "in.y4m"
        dst = tmp_path / "out.y4m"
        _write_y4m(src, 1, 42, 30)  # 1.5x -> 63x45 odd; evenoutput clamps
        rc = cli_main(
            ["upscale", "-i", str(src), "-o", str(dst), "--ratio", "1.5",
             "--evenoutput",
             "--filterfolder", "/root/reference/filters_1.5x/filters_highres"]
        )
        assert rc == 0
        rd = video.Y4MReader(str(dst))
        assert (rd.fmt.width, rd.fmt.height) == (62, 44)


class TestCompare:
    def test_compare_identical(self, tmp_path, capsys):
        src = tmp_path / "a.y4m"
        _write_y4m(src, 2, 32, 24)
        rc = cli_main(["compare", str(src), str(src), "--ssim"])
        assert rc == 0
        import json

        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["psnr_y_db"] == float("inf") or out["psnr_y_db"] > 99
        assert out["ssim_y"] == pytest.approx(1.0, abs=1e-4)

    def test_compare_different(self, tmp_path, capsys):
        a = tmp_path / "a.y4m"
        b = tmp_path / "b.y4m"
        _write_y4m(a, 1, 32, 24)
        fmt, frames = _write_y4m(b, 1, 32, 24)
        rc = cli_main(["compare", str(a), str(b)])
        assert rc == 0


def test_cli_train_roundtrip(tmp_path):
    """raisr train produces a reference-format bank usable by upscale."""
    import numpy as np
    from raisr_tpu.cli import main

    clip = os.path.join(str(tmp_path), "src.y4m")
    rng = np.random.default_rng(21)
    w, h = 64, 48
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
            f.write(rng.integers(16, 240, 2 * (w // 2) * (h // 2),
                                 dtype=np.uint8).tobytes())

    bank = os.path.join(str(tmp_path), "bank")
    assert main(["train", "-o", bank, "-i", clip, "--frames", "2"]) == 0
    assert os.path.exists(os.path.join(bank, "filterbin_2_8"))
    out = os.path.join(str(tmp_path), "up.y4m")
    assert main([
        "upscale", "-i", clip, "-o", out, "--filterfolder", bank,
        "--backend", "reference",
    ]) == 0
    assert os.path.getsize(out) > 4 * w * h


def test_cli_train_two_pass(tmp_path):
    """raisr train --passes 2 produces pass-1 AND pass-2 banks (the role of
    the reference's filterbin_*_2 files) and the folder runs with
    --passes 2; the pass-2 bank must differ from the pass-1 bank (it was
    trained on the pass-1 inference output, not the bilinear upscale)."""
    import numpy as np
    from raisr_tpu.cli import main
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model

    clip = os.path.join(str(tmp_path), "src.y4m")
    rng = np.random.default_rng(22)
    w, h = 64, 48
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
            f.write(rng.integers(16, 240, 2 * (w // 2) * (h // 2),
                                 dtype=np.uint8).tobytes())

    bank = os.path.join(str(tmp_path), "bank2p")
    assert main(["train", "-o", bank, "-i", clip, "--frames", "2",
                 "--passes", "2"]) == 0
    assert os.path.exists(os.path.join(bank, "filterbin_2_8"))
    assert os.path.exists(os.path.join(bank, "filterbin_2_8_2"))

    model = load_model(bank, RaisrConfig(filterfolder=bank, passes=2))
    assert len(model.banks) == 2
    assert not np.array_equal(model.banks[0].filters, model.banks[1].filters)

    out = os.path.join(str(tmp_path), "up2.y4m")
    assert main([
        "upscale", "-i", clip, "-o", out, "--filterfolder", bank,
        "--passes", "2", "--backend", "reference",
    ]) == 0
    assert os.path.getsize(out) > 4 * w * h


def test_cli_train_15x(tmp_path):
    """raisr train --ratio 1.5 mints a single-phase (216-filter) bank the
    1.5x pipeline loads and runs — trainer parity with the reference's
    filters_1.5x families."""
    import numpy as np
    from raisr_tpu.cli import main
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model

    clip = os.path.join(str(tmp_path), "src.y4m")
    rng = np.random.default_rng(23)
    w, h = 64, 48
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
            f.write(rng.integers(16, 240, 2 * (w // 2) * (h // 2),
                                 dtype=np.uint8).tobytes())

    bank = os.path.join(str(tmp_path), "bank15")
    assert main(["train", "-o", bank, "-i", clip, "--frames", "2",
                 "--ratio", "1.5"]) == 0
    model = load_model(bank, RaisrConfig(filterfolder=bank, ratio=1.5))
    assert model.banks[0].filters.shape[0] == 216  # single-phase bank
    assert model.banks[0].pixel_types == 1

    out = os.path.join(str(tmp_path), "up15.y4m")
    assert main([
        "upscale", "-i", clip, "-o", out, "--filterfolder", bank,
        "--ratio", "1.5", "--backend", "reference",
    ]) == 0
    assert os.path.getsize(out) > int(w * 1.5) * int(h * 1.5)
