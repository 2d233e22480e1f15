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


def test_header_version_matches_package():
    """The C header's RAISR_TPU_VERSION_* (the analogue of the reference's
    RaisrVersion.h) must agree with raisr_tpu.__version__."""
    import re

    import raisr_tpu

    hdr = open(os.path.join(REPO, "include", "raisr_tpu.h")).read()
    parts = {
        k: re.search(rf"#define RAISR_TPU_VERSION_{k} (\d+)", hdr).group(1)
        for k in ("MAJOR", "MINOR", "PATCH")
    }
    hdr_ver = f"{parts['MAJOR']}.{parts['MINOR']}.{parts['PATCH']}"
    assert hdr_ver == raisr_tpu.__version__


def test_shared_library_version():
    """RTPU_Version() returns the header version (callable pre-Init)."""
    import raisr_tpu

    lib_path = os.path.join(REPO, "build", "capi", "libraisr_tpu.so")
    if not os.path.exists(lib_path):
        pytest.skip("libraisr_tpu.so not built")
    lib = ctypes.CDLL(lib_path)
    lib.RTPU_Version.restype = ctypes.c_char_p
    assert lib.RTPU_Version().decode() == raisr_tpu.__version__


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


@pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("cc") is None,
    reason="native toolchain unavailable",
)
def test_capi_y4m_bit_identical_to_cli(tmp_path):
    """tools/capi_y4m (the frame-by-frame C consumer an FFmpeg filter would
    be) must produce byte-identical Y4M output to the Python CLI."""
    lib = os.path.join(REPO, "build", "capi", "libraisr_tpu.so")
    y4m_bin = os.path.join(REPO, "build", "capi", "capi_y4m")
    if not (os.path.exists(lib) and os.path.exists(y4m_bin)):
        subprocess.run(
            [os.path.join(REPO, "tools", "build_capi.sh")],
            check=True, capture_output=True, timeout=600,
        )

    rng = np.random.default_rng(5)
    w, h = 64, 48
    clip = os.path.join(str(tmp_path), "in.y4m")
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H48 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
            f.write(rng.integers(16, 240, 2 * (w // 2) * (h // 2),
                                 dtype=np.uint8).tobytes())

    out_cli = os.path.join(str(tmp_path), "cli.y4m")
    out_c = os.path.join(str(tmp_path), "capi.y4m")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=os.path.join(REPO, "build", "capi"))
    r = subprocess.run(
        [os.sys.executable, "-m", "raisr_tpu.cli", "upscale", "-i", clip,
         "-o", out_cli, "--ratio", "2", "--passes", "2",
         "--filterfolder", FOLDER],
        capture_output=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    r = subprocess.run(
        [y4m_bin, clip, out_c, FOLDER, "2", "8", "0", "2", "1", "2"],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert open(out_c, "rb").read() == open(out_cli, "rb").read()


def test_bridge_tier_selects_fast_tier():
    """RTPU_InitEx's tier parameter (the analogue of the reference ABI's
    asmType) must select the bf16 fast tier in the bridge engine."""
    from raisr_tpu import capi_bridge as cb

    rc = cb.init("/root/reference/filters_2x/filters_lowres",
                 2.0, 8, 0, 1, 1, tier=1)
    assert rc == 0
    assert cb._cfg.dtype == "bfloat16"
    assert cb._engine._statics.mxu_passes == 1
    cb.deinit()
    rc = cb.init("/root/reference/filters_2x/filters_lowres",
                 2.0, 8, 0, 1, 1)
    assert rc == 0
    assert cb._cfg.dtype == "float32"
    cb.deinit()


def test_ffmpeg_filter_compiles_against_avutil():
    """vf_raisr_tpu.c must type-check under a real compiler: genuine
    libavutil headers (AVFrame, AVOption, pixdesc — everything the frame
    loop manipulates) plus the minimal libavfilter shim in
    ffmpeg/compile_shim/. The authoritative full FFmpeg-tree build runs in
    CI (ffmpeg/build_ffmpeg_ci.sh)."""
    script = os.path.join(REPO, "ffmpeg", "compile_check.sh")
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    r = subprocess.run([script], capture_output=True, text=True, timeout=120)
    if r.returncode == 77:
        pytest.skip("libavutil-dev headers not installed")
    assert r.returncode == 0, r.stdout + r.stderr


def test_ffmpeg_filter_executes_via_shim_harness(tmp_path):
    """vf_raisr_tpu.c EXECUTED locally: the real filter code (option parsing
    via genuine libavutil av_opt, init, config_props, filter_frame on real
    AVFrames with aligned/padded linesizes) driven by the functional
    mini-libavfilter in ffmpeg/shim_harness.c, byte-compared against the
    Python CLI. Width 52 forces linesize (64) > width, exercising the
    filter's RTPUPlane step handling — the part a contiguous-buffer harness
    (capi_y4m) cannot reach. Full-tree build+transcode parity runs in CI."""
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    lib = os.path.join(REPO, "build", "capi", "libraisr_tpu.so")
    if not os.path.exists(lib):
        subprocess.run(
            [os.path.join(REPO, "tools", "build_capi.sh")],
            check=True, capture_output=True, timeout=600,
        )
    r = subprocess.run(
        [os.path.join(REPO, "ffmpeg", "shim_filter_build.sh")],
        capture_output=True, text=True, timeout=120,
    )
    if r.returncode == 77:
        pytest.skip("libavutil-dev not installed")
    assert r.returncode == 0, r.stdout + r.stderr

    rng = np.random.default_rng(7)
    w, h = 52, 40
    clip = os.path.join(str(tmp_path), "in.y4m")
    with open(clip, "wb") as f:
        f.write(b"YUV4MPEG2 W52 H40 F30:1 Ip A1:1 C420\n")
        for _ in range(2):
            f.write(b"FRAME\n")
            f.write(rng.integers(16, 235, w * h, dtype=np.uint8).tobytes())
            f.write(rng.integers(16, 240, 2 * (w // 2) * (h // 2),
                                 dtype=np.uint8).tobytes())

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LD_LIBRARY_PATH=os.path.join(REPO, "build", "capi"))
    out_flt = os.path.join(str(tmp_path), "filter.y4m")
    out_cli = os.path.join(str(tmp_path), "cli.y4m")
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip, out_flt,
         "ratio=2:passes=2:filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    r = subprocess.run(
        [os.sys.executable, "-m", "raisr_tpu.cli", "upscale", "-i", clip,
         "-o", out_cli, "--ratio", "2", "--passes", "2",
         "--filterfolder", FOLDER],
        capture_output=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert open(out_flt, "rb").read() == open(out_cli, "rb").read()

    # a verbatim vf_raisr-style command line must drop in: string range,
    # asm= (f32-grade values map to the f32 tier), platform/threadcount
    # accepted (vf_raisr.c:82-93) — output identical to the f32 run above
    out_compat = os.path.join(str(tmp_path), "compat.y4m")
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip,
         out_compat,
         "ratio=2:passes=2:range=video:asm=avx512:platform=0:threadcount=20"
         ":filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert open(out_compat, "rb").read() == open(out_cli, "rb").read()

    # an unknown range string must be rejected loudly at init
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip,
         os.path.join(str(tmp_path), "badrange.y4m"),
         "ratio=2:range=limited:filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode != 0
    assert b"unknown range" in r.stderr

    # an unknown asm string must be rejected loudly, like vf_raisr
    # (vf_raisr.c:129-132) — not silently mapped to the f32 tier
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip,
         os.path.join(str(tmp_path), "badasm.y4m"),
         "ratio=2:asm=avx512f16:filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode != 0
    assert b"unknown asm" in r.stderr

    # the bits/format validation path must reject a mismatch loudly
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip,
         os.path.join(str(tmp_path), "bad.y4m"),
         "ratio=2:bits=10:filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode != 0
    assert b"bits=8" in r.stderr

    # 10-bit (YUV420P10LE) through the same filter code vs the CLI
    clip10 = os.path.join(str(tmp_path), "in10.y4m")
    with open(clip10, "wb") as f:
        f.write(b"YUV4MPEG2 W52 H40 F30:1 Ip A1:1 C420p10\n")
        f.write(b"FRAME\n")
        f.write(rng.integers(64, 940, w * h, dtype=np.uint16)
                .astype("<u2").tobytes())
        f.write(rng.integers(64, 960, 2 * (w // 2) * (h // 2),
                             dtype=np.uint16).astype("<u2").tobytes())
    out10_flt = os.path.join(str(tmp_path), "filter10.y4m")
    out10_cli = os.path.join(str(tmp_path), "cli10.y4m")
    r = subprocess.run(
        [os.path.join(REPO, "build", "capi", "shim_filter"), clip10,
         out10_flt, "ratio=2:bits=10:passes=1:filterfolder=" + FOLDER],
        capture_output=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    r = subprocess.run(
        [os.sys.executable, "-m", "raisr_tpu.cli", "upscale", "-i", clip10,
         "-o", out10_cli, "--ratio", "2", "--passes", "1", "--bits", "10",
         "--filterfolder", FOLDER],
        capture_output=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert open(out10_flt, "rb").read() == open(out10_cli, "rb").read()


def test_bridge_set_device():
    """RTPU_SetDevice analogue: valid index pins the default device,
    out-of-range reports [RAISR ERROR] and returns nonzero."""
    import jax

    assert capi_bridge.set_device(0) == 0
    assert jax.config.jax_default_device == jax.devices()[0]
    assert capi_bridge.set_device(10_000) != 0
