"""Native I/O extension tests (and their numpy fallbacks)."""

import numpy as np
import pytest

from raisr_tpu import io_native, video
from raisr_tpu.engine import Frame


class TestNV12:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_roundtrip(self, dtype):
        rng = np.random.default_rng(0)
        uv = rng.integers(0, 255, size=(6, 16)).astype(dtype)
        u, v = io_native.nv12_to_planar(uv)
        np.testing.assert_array_equal(u, uv[:, 0::2])
        np.testing.assert_array_equal(v, uv[:, 1::2])
        np.testing.assert_array_equal(io_native.planar_to_nv12(u, v), uv)

    def test_raw_nv12_reader_writer(self, tmp_path):
        rng = np.random.default_rng(1)
        h, w = 8, 12
        fmt = video.VideoFormat(w, h, 8, "nv12")
        frame = Frame(
            y=rng.integers(0, 255, size=(h, w)).astype(np.uint8),
            u=rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8),
            v=rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8),
        )
        path = tmp_path / "clip.yuv"
        wr = video.RawYUVWriter(str(path), fmt)
        wr.write(frame)
        wr.close()
        assert path.stat().st_size == h * w * 3 // 2
        rd = video.RawYUVReader(str(path), fmt)
        got = next(iter(rd))
        np.testing.assert_array_equal(got.y, frame.y)
        np.testing.assert_array_equal(got.u, frame.u)
        np.testing.assert_array_equal(got.v, frame.v)


class TestY4MScan:
    def test_offsets(self, tmp_path):
        fmt = video.VideoFormat(16, 8, 8, "420")
        path = tmp_path / "c.y4m"
        wr = video.Y4MWriter(str(path), fmt)
        rng = np.random.default_rng(2)
        for _ in range(3):
            wr.write(
                Frame(
                    y=rng.integers(0, 255, (8, 16)).astype(np.uint8),
                    u=rng.integers(0, 255, (4, 8)).astype(np.uint8),
                    v=rng.integers(0, 255, (4, 8)).astype(np.uint8),
                )
            )
        wr.close()
        offsets = io_native.y4m_frame_offsets(str(path), fmt.frame_bytes())
        assert len(offsets) == 3
        # offsets point at frame payloads: Y of frame 0 readable directly
        with open(path, "rb") as f:
            f.seek(offsets[1])
            data = np.frombuffer(f.read(fmt.frame_bytes()), np.uint8)
        assert data.size == fmt.frame_bytes()


def test_plane_mse():
    a = np.array([[1, 2], [3, 4]], np.uint8)
    b = np.array([[1, 4], [3, 1]], np.uint8)
    assert abs(io_native.plane_mse(a, b) - (0 + 4 + 0 + 9) / 4) < 1e-12
