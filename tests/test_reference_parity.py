"""Ground-truth parity vs the ACTUAL reference library.

These tests compile the reference sources (/root/reference/Library,
unmodified) against the minimal IPP shim in tools/refbuild/ and compare
raisr_tpu's output with the reference binary's output on the same inputs —
the BASELINE.md "PSNR within 0.05 dB of AVX-512 reference output" check,
measured for real rather than against self-authored goldens.

Established facts these tests encode (see docs/PARITY.md "Reference
cross-validation"):
  - The reference's own AVX2 and AVX512 outputs differ from each other
    (rsqrt14-approximation bucket flips, Raisr_AVX512.cpp:175-258): by
    <=1 LSB at 8-bit but max ~31 / 65% of pixels at 10-bit. "Parity" is
    therefore judged as: at least as close to AVX-512 output as the
    reference's own AVX2 backend is.
  - In Randomness mode the reference never writes the ragged-edge notch of
    the LAST processed row (the per-row edge memcpy at Raisr.cpp:1252-1265
    copies row r-1's right edge, so row endRow-1 gets no copy; with
    CountOfBitsChanged the final blend pass covers it). Those bytes stay
    uninitialized in the reference output; the comparison masks that row.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
HARNESS = os.path.join(REPO, "build", "refbuild", "ref_harness")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "Library"))
    or shutil.which("g++") is None,
    reason="reference sources or toolchain unavailable",
)

W, H = 96, 64


def _build_harness():
    if not os.path.exists(HARNESS):
        subprocess.run(
            [os.path.join(REPO, "tools", "refbuild", "build_reference.sh")],
            check=True, capture_output=True, timeout=600,
        )
    return HARNESS


def _content(bits: int, seed: int = 3) -> np.ndarray:
    """Structured test content: gradients + edges + texture + noise."""
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(W), np.arange(H))
    scale = (1 << bits) / 256.0
    img = (60 + 80 * np.sin(x / 9.0) + 60 * (y > H // 2)
           + 40 * np.sin((x + y) / 5.0) + rng.normal(0, 6, (H, W))) * scale
    lo, hi = {8: (16, 235), 10: (64, 940), 16: (0, 65535)}[bits]
    dtype = np.uint8 if bits == 8 else np.uint16
    return np.clip(img, lo, hi).astype(dtype)


def _write_yuv(path: str, yp: np.ndarray, bits: int):
    mid = 128 if bits == 8 else 512
    u = np.full((H // 2, W // 2), mid, yp.dtype)
    with open(path, "wb") as f:
        f.write(yp.tobytes())
        f.write(u.tobytes())
        f.write(u.tobytes())


def _run_reference(tmp, yp, *, folder, ratio=2.0, bits=8, rng_t=1, threads=1,
                   asm=2, passes=1, mode=1, blending=2):
    """Run the compiled reference; returns the output Y plane."""
    harness = _build_harness()
    inp = os.path.join(tmp, f"in_{bits}.yuv")
    outp = os.path.join(tmp, f"out_{asm}_{passes}_{blending}_{mode}.yuv")
    _write_yuv(inp, yp, bits)
    r = subprocess.run(
        [harness, os.path.join(REFERENCE_ROOT, folder), str(ratio), str(bits),
         str(rng_t), str(threads), str(asm), str(passes), str(mode),
         str(blending), str(W), str(H), inp, outp],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]
    ow, oh = int(W * ratio), int(H * ratio)
    dtype = np.uint8 if bits == 8 else np.uint16
    n = ow * oh * dtype().itemsize
    return np.frombuffer(open(outp, "rb").read()[:n], dtype).reshape(oh, ow)


def _run_mine(yp, *, folder, ratio=2.0, bits=8, rng_t=1, passes=1, mode=1,
              blending=2):
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine

    cfg = RaisrConfig(
        filterfolder=os.path.join(REFERENCE_ROOT, folder), ratio=ratio,
        bits=bits, range=rng_t - 1, passes=passes, mode=mode,
        blending=blending, backend="reference",
    )
    return RaisrEngine(cfg).process(Frame(y=yp)).y


def _psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("lowres_p1", dict(folder="filters_2x/filters_lowres")),
        ("highres_p2_t4", dict(folder="filters_2x/filters_highres", passes=2,
                               threads=4)),
        ("highres_p2_mode2", dict(folder="filters_2x/filters_highres",
                                  passes=2, mode=2)),
        ("denoise_p2_mode2", dict(folder="filters_2x/filters_denoise",
                                  passes=2, mode=2)),
        ("fullrange", dict(folder="filters_2x/filters_highres", rng_t=2)),
        ("ratio15", dict(folder="filters_1.5x/filters_highres", ratio=1.5)),
    ],
)
def test_8bit_matches_avx512(tmp_path, name, kw):
    """8-bit CoBC outputs vs the AVX-512 reference binary.

    Measured r3 state (this content): PSNR 66.3-85.1 dB, max |diff| <= 7,
    frac(|diff|>2) <= 4.5e-4. The residual is rare hash-bucket flips at fp
    ties: the reference sums 121 structure-tensor products in scalar C++
    order (and AVX-512 additionally uses rsqrt14 approximations,
    Raisr_AVX512.cpp:175-258) while we sum vectorized — exact <=2 LSB
    everywhere would require replicating their summation order AND their
    rsqrt14 error. The honest bar: at least as close to the AVX-512 output
    as the reference's own exact-sqrt AVX2 build is, plus tight absolute
    bounds on PSNR / max / flip fraction."""
    yp = _content(8)
    mine_kw = {k: v for k, v in kw.items() if k != "threads"}
    ref = _run_reference(str(tmp_path), yp, asm=2, **kw)
    ref_avx2 = _run_reference(str(tmp_path), yp, asm=1, **kw)
    mine = _run_mine(yp, **mine_kw)
    p = _psnr(mine, ref, 255.0)
    p_isa = _psnr(ref_avx2, ref, 255.0)  # the reference's own ISA spread
    d = np.abs(mine.astype(int) - ref.astype(int))
    assert p >= 60.0, f"{name}: PSNR vs reference {p:.2f} dB"
    assert p >= p_isa - 0.5, f"{name}: PSNR {p:.2f} vs ISA spread {p_isa:.2f}"
    assert d.max() <= 8, f"{name}: max |diff| {d.max()}"
    assert (d > 2).mean() <= 1e-3, f"{name}: frac>2 {(d > 2).mean():.6f}"


def test_multiframe_clip_parity(tmp_path):
    """Multi-frame parity: a 6-frame clip with motion (panning texture +
    edges + per-frame noise) through the reference binary's frame loop
    (SetRes once + Process per frame, harness.cpp) vs our StreamProcessor
    batched path (batch=4: one full group + a padded tail). Every frame must
    meet the single-frame envelope bounds."""
    import jax.numpy as jnp

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine
    from raisr_tpu.stream import StreamProcessor

    n = 6
    rng = np.random.default_rng(21)
    x, y = np.meshgrid(np.arange(W + n), np.arange(H))
    base = 60 + 80 * np.sin(x / 9.0) + 60 * (y > H // 2) + 40 * np.sin((x + y) / 5.0)
    frames = [
        np.clip(base[:, i : i + W] + rng.normal(0, 6, (H, W)), 16, 235)
        .astype(np.uint8)
        for i in range(n)  # 1-px horizontal pan per frame
    ]

    harness = _build_harness()
    inp = os.path.join(str(tmp_path), "clip.yuv")
    outp = os.path.join(str(tmp_path), "clip_out.yuv")
    mid = np.full((H // 2, W // 2), 128, np.uint8)
    with open(inp, "wb") as f:
        for fr in frames:
            f.write(fr.tobytes())
            f.write(mid.tobytes())
            f.write(mid.tobytes())
    r = subprocess.run(
        [harness, os.path.join(REFERENCE_ROOT, "filters_2x/filters_highres"),
         "2", "8", "1", "1", "2", "2", "1", "2", str(W), str(H), inp, outp,
         str(n)],
        capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ow, oh = 2 * W, 2 * H
    frame_bytes = ow * oh + 2 * (ow // 2) * (oh // 2)
    blob = open(outp, "rb").read()
    refs = [
        np.frombuffer(blob[i * frame_bytes : i * frame_bytes + ow * oh],
                      np.uint8).reshape(oh, ow).astype(int)
        for i in range(n)
    ]

    cfg = RaisrConfig(
        filterfolder=os.path.join(REFERENCE_ROOT, "filters_2x/filters_highres"),
        passes=2, backend="reference",
    )
    engine = RaisrEngine(cfg)
    outs = list(
        StreamProcessor(engine, depth=2, batch=4).process(
            iter([Frame(y=fr, u=mid, v=mid) for fr in frames])
        )
    )
    assert len(outs) == n
    for i, (mine_f, ref_f) in enumerate(zip(outs, refs)):
        mine = mine_f.y.astype(int)
        p = _psnr(mine, ref_f, 255.0)
        d = np.abs(mine - ref_f)
        assert p >= 60.0, (i, p)
        assert d.max() <= 8 and (d > 2).mean() <= 1e-3, (i, d.max())


def test_randomness_blend(tmp_path):
    """Randomness blending, masking the last processed row (see module
    docstring: the reference leaves its ragged-edge notch unwritten)."""
    yp = _content(8)
    kw = dict(folder="filters_2x/filters_highres", blending=1)
    ref = _run_reference(str(tmp_path), yp, asm=2, **kw).astype(int)
    mine = _run_mine(yp, **kw).astype(int)
    oh = ref.shape[0]
    mask = np.ones_like(ref, bool)
    mask[oh - 7, :] = False  # last processed row: reference's unwritten notch
    d = np.abs(mine - ref)[mask]
    mse = float((d.astype(np.float64) ** 2).mean())
    p = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert p >= 55.0 and d.max() <= 8, (p, d.max())


def test_10bit_within_reference_isa_envelope(tmp_path):
    """At 10-bit the reference's AVX2 and AVX512 disagree heavily (rsqrt14
    bucket flips). Require raisr_tpu to be AT LEAST as close to the AVX-512
    output as the reference's own AVX2 build is, and nearly identical to
    the exact-sqrt AVX2 build."""
    yp = _content(10)
    kw = dict(folder="filters_2x/filters_highres", bits=10)
    ref512 = _run_reference(str(tmp_path), yp, asm=2, **kw)
    ref256 = _run_reference(str(tmp_path), yp, asm=1, **kw)
    mine = _run_mine(yp, **kw)
    p_mine_512 = _psnr(mine, ref512, 1023.0)
    p_256_512 = _psnr(ref256, ref512, 1023.0)
    p_mine_256 = _psnr(mine, ref256, 1023.0)
    assert p_mine_512 >= p_256_512 - 0.5, (p_mine_512, p_256_512)
    assert p_mine_256 >= 65.0, p_mine_256


def test_16bit_processing_within_reference_isa_envelope(tmp_path):
    """16-bit PROCESSING parity (beyond the bank-load round-trip of
    tests/test_16bit.py): the reference supports bitDepth=16 but ships no
    16-bit banks (always full range, Raisr.cpp:1462-1469), so a self-trained
    fp32 bank runs through BOTH engines on the same content. Same envelope
    criterion as 10-bit: at least as close to the AVX-512 output as the
    reference's own AVX2 build is."""
    from raisr_tpu.train import TrainConfig, save_filter_folder
    from raisr_tpu.train.trainer import train_filterbank

    rng = np.random.default_rng(4)
    pairs = []
    for _ in range(2):
        x, y = np.meshgrid(np.arange(80), np.arange(64))
        hr = np.clip(
            20000 + 18000 * np.sin(x / 7.0) + 12000 * (y > 32)
            + rng.normal(0, 800, (64, 80)), 0, 65535
        ).astype(np.uint16)
        lr = np.clip(
            np.floor(hr.reshape(32, 2, 40, 2).mean(axis=(1, 3)) + 0.5),
            0, 65535,
        ).astype(np.uint16)
        pairs.append((lr, hr))
    bank = train_filterbank(pairs, TrainConfig(bits=16, chunk=512))
    folder = str(tmp_path / "bank16")
    save_filter_folder(folder, [bank], bits=16)

    yp = _content(16)
    kw = dict(folder=folder, bits=16, rng_t=2)
    ref512 = _run_reference(str(tmp_path), yp, asm=2, **kw)
    ref256 = _run_reference(str(tmp_path), yp, asm=1, **kw)
    mine = _run_mine(yp, **kw)
    p_mine_512 = _psnr(mine, ref512, 65535.0)
    p_256_512 = _psnr(ref256, ref512, 65535.0)
    p_mine_256 = _psnr(mine, ref256, 65535.0)
    assert p_mine_512 >= p_256_512 - 0.5, (p_mine_512, p_256_512)
    assert p_mine_256 >= 60.0, p_mine_256


def _ground_truth_pair(bits: int):
    """(hr ground truth, lr 2x box downscale) of structured content."""
    rng = np.random.default_rng(9)
    x, y = np.meshgrid(np.arange(2 * W), np.arange(2 * H))
    scale = (1 << bits) / 256.0
    lo, hi = {8: (16, 235), 10: (64, 940)}[bits]
    hr = np.clip((60 + 80 * np.sin(x / 17.0) + 60 * (y > H)
                  + 40 * np.sin((x + y) / 9.0)
                  + rng.normal(0, 4, (2 * H, 2 * W))) * scale,
                 lo, hi)  # HR ground truth, 192x128
    lr = np.clip(np.floor(
        hr.reshape(H, 2, W, 2).mean(axis=(1, 3)) + 0.5), lo, hi)
    dtype = np.uint8 if bits == 8 else np.uint16
    return hr.astype(dtype), lr.astype(dtype)


def test_psnr_vs_ground_truth_within_half_tenth(tmp_path):
    """BASELINE.md criterion, measured directly: upscale a downscaled image
    and compare PSNR-vs-original between raisr_tpu and the reference;
    the two PSNRs must agree within 0.05 dB."""
    hr, lr = _ground_truth_pair(8)
    kw = dict(folder="filters_2x/filters_highres", passes=2)
    ref = _run_reference(str(tmp_path), lr, asm=2, **kw)
    mine = _run_mine(lr, **kw)
    p_ref = _psnr(ref, hr, 255.0)
    p_mine = _psnr(mine, hr, 255.0)
    assert abs(p_mine - p_ref) <= 0.05, (p_mine, p_ref)


@pytest.mark.parametrize(
    "dtype,bits",
    [
        # the headline (bf16) tier's BASELINE quality criterion stays in the
        # default suite; the other fast tiers exercise the same assertion and
        # run in CI (marked slow — ~3 min each in interpret mode)
        ("bfloat16", 8),
        pytest.param("int8", 8, marks=pytest.mark.slow),
        # 10-bit fast tier: centered single-slot (pcenter=512) since round 5
        pytest.param("bfloat16", 10, marks=pytest.mark.slow),
        # exact-patch p_split packing, kept reachable as bfloat16_exact
        pytest.param("bfloat16_exact", 10, marks=pytest.mark.slow),
    ],
    ids=["bf16_tier", "i8_tier", "fast10_centered", "p_split_10bit"],
)
def test_psnr_vs_ground_truth_fast_tiers(tmp_path, dtype, bits):
    """The BASELINE quality criterion (ΔPSNR-vs-ground-truth ≤ 0.05 dB vs
    the AVX-512 reference) asserted on the FAST tiers — the bf16 tier the
    headline bench runs (the analogue of the reference's auto-selected
    AVX512FP16 production tier, Raisr.cpp:1492-1501), the int8-pair tier,
    and the p_split 10-bit tier — not just the default f32-grade tier
    covered by test_psnr_vs_ground_truth_within_half_tenth."""
    import jax.numpy as jnp  # noqa: F401  (engine import chain needs jax)

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine
    import raisr_tpu.ops.pallas.full_kernel as fk

    hr, lr = _ground_truth_pair(bits)
    peak = float((1 << bits) - 1) if bits > 8 else 255.0
    kw = dict(folder="filters_2x/filters_highres", passes=2, bits=bits)
    ref = _run_reference(str(tmp_path), lr, asm=2, **kw)

    orig = fk.raisr_pass_pallas_full
    fk.raisr_pass_pallas_full = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        cfg = RaisrConfig(
            filterfolder=os.path.join(REFERENCE_ROOT, kw["folder"]),
            passes=2, bits=bits, backend="pallas", dtype=dtype,
        )
        mine = RaisrEngine(cfg).process(Frame(y=lr)).y
    finally:
        fk.raisr_pass_pallas_full = orig

    p_ref = _psnr(ref, hr, peak)
    p_mine = _psnr(mine, hr, peak)
    print(f"{dtype}/{bits}-bit PSNR vs GT: mine {p_mine:.4f} dB, "
          f"ref AVX-512 {p_ref:.4f} dB (delta {p_mine - p_ref:+.4f})")
    assert abs(p_mine - p_ref) <= 0.05, (p_mine, p_ref)


@pytest.mark.skipif(
    "avx512_fp16" not in open("/proc/cpuinfo").read(),
    reason="host CPU lacks AVX512FP16; reference fp16 tier not buildable",
)
def test_bf16_tier_inside_reference_fp16_envelope(tmp_path):
    """The bf16 tier (mxu_passes=1, --dtype bfloat16) is the analogue of the
    reference's AVX512FP16 tier — the tier behind its production 60-fps
    recipe (+25% over f32, /root/reference/docs/performance.md:5). Qualify
    it for real, against the compiled reference with the FP16 path enabled
    (asm=5, Raisr.cpp:1492-1501): our bf16 output must be at least as close
    to the reference's f32 AVX-512 output as the reference's OWN FP16 output
    is, on both PSNR and max |diff|. This is the quality basis on which
    bench.py reports the fast tier."""
    import jax.numpy as jnp  # noqa: F401  (engine import chain needs jax)

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine
    import raisr_tpu.ops.pallas.full_kernel as fk

    yp = _content(8)
    kw = dict(folder="filters_2x/filters_highres", passes=2)
    ref_f32 = _run_reference(str(tmp_path), yp, asm=2, **kw).astype(int)
    ref_fp16 = _run_reference(str(tmp_path), yp, asm=5, **kw).astype(int)

    orig = fk.raisr_pass_pallas_full
    fk.raisr_pass_pallas_full = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        cfg = RaisrConfig(
            filterfolder=os.path.join(REFERENCE_ROOT, kw["folder"]),
            passes=2, backend="pallas", dtype="bfloat16",
        )
        mine = RaisrEngine(cfg).process(Frame(y=yp)).y.astype(int)
    finally:
        fk.raisr_pass_pallas_full = orig

    p_ref16 = _psnr(ref_fp16, ref_f32, 255.0)  # the reference's own envelope
    p_mine = _psnr(mine, ref_f32, 255.0)
    d_ref16 = np.abs(ref_fp16 - ref_f32).max()
    d_mine = np.abs(mine - ref_f32).max()
    assert p_mine >= p_ref16, (p_mine, p_ref16)
    assert d_mine <= d_ref16, (d_mine, d_ref16)
    # and the envelope itself is what BASELINE assumed: a fast tier, not junk
    assert p_ref16 >= 50.0, p_ref16


def test_uv_resize_bit_identical(tmp_path):
    """The cheap-upscale path must match the reference's (shimmed) IPP
    resize bit-for-bit — verified on the UV planes, which the reference
    processes with resize only (Raisr.cpp:1373-1388)."""
    import jax.numpy as jnp

    from raisr_tpu.ops.resize import cheap_upscale

    for bits in (8, 10):
        yp = _content(bits)
        harness = _build_harness()
        inp = os.path.join(str(tmp_path), f"uv_{bits}.yuv")
        outp = os.path.join(str(tmp_path), f"uv_out_{bits}.yuv")
        _write_yuv(inp, yp, bits)
        # make the U plane structured too (the default is flat mid-gray)
        dtype = np.uint8 if bits == 8 else np.uint16
        u = yp[: H // 2, : W // 2]
        with open(inp, "wb") as f:
            f.write(yp.tobytes())
            f.write(u.tobytes())
            f.write(u.tobytes())
        r = subprocess.run(
            [harness, os.path.join(REFERENCE_ROOT, "filters_2x/filters_lowres"),
             "2", str(bits), "1", "1", "2", "1", "1", "2", str(W), str(H),
             inp, outp],
            capture_output=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        ysz = W * H * 4 * dtype().itemsize
        usz = (W * H) * dtype().itemsize
        u_ref = np.frombuffer(
            open(outp, "rb").read()[ysz:ysz + usz], dtype).reshape(H, W)
        mine = np.asarray(
            cheap_upscale(jnp.asarray(u.astype(np.float32)), H, W, bits)
        ).astype(dtype)
        assert np.array_equal(mine, u_ref), f"UV resize mismatch at {bits}-bit"


def test_odd_dimensions_15x(tmp_path):
    """Odd input/output dims at 1.5x (output truncation per
    vf_raisr.c:208-224) must match the reference binary."""
    harness = _build_harness()
    w, h = 90, 62  # -> 135x93, both odd
    rng = np.random.default_rng(3)
    yp = np.clip(rng.normal(128, 40, (h, w)), 16, 235).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    inp = os.path.join(str(tmp_path), "odd.yuv")
    outp = os.path.join(str(tmp_path), "odd_out.yuv")
    with open(inp, "wb") as f:
        f.write(yp.tobytes())
        f.write(u.tobytes())
        f.write(u.tobytes())
    r = subprocess.run(
        [harness, os.path.join(REFERENCE_ROOT, "filters_1.5x/filters_highres"),
         "1.5", "8", "1", "1", "2", "1", "1", "2", str(w), str(h), inp, outp],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ow, oh = int(w * 1.5), int(h * 1.5)
    ref = np.frombuffer(
        open(outp, "rb").read()[: ow * oh], np.uint8
    ).reshape(oh, ow)

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine

    cfg = RaisrConfig(
        filterfolder=os.path.join(REFERENCE_ROOT, "filters_1.5x/filters_highres"),
        ratio=1.5, backend="reference",
    )
    mine = RaisrEngine(cfg).process(Frame(y=yp)).y
    assert mine.shape == (oh, ow)
    assert _psnr(mine, ref, 255.0) >= 55.0


@pytest.mark.skipif(
    "avx512_fp16" not in open("/proc/cpuinfo").read(),
    reason="host CPU lacks AVX512FP16; reference fp16 tier not buildable",
)
def test_i8_tier_inside_reference_fp16_envelope(tmp_path):
    """The int8-pair tier (--dtype int8) claims quality between the bf16
    fast tier and f32-grade: like the bf16 test above, its output must sit
    inside the reference's own FP16-vs-f32 envelope (PSNR and max |diff|)
    against the compiled reference's f32 AVX-512 output."""
    import jax.numpy as jnp  # noqa: F401  (engine import chain needs jax)

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import Frame, RaisrEngine
    import raisr_tpu.ops.pallas.full_kernel as fk

    yp = _content(8)
    kw = dict(folder="filters_2x/filters_highres", passes=2)
    ref_f32 = _run_reference(str(tmp_path), yp, asm=2, **kw).astype(int)
    ref_fp16 = _run_reference(str(tmp_path), yp, asm=5, **kw).astype(int)

    orig = fk.raisr_pass_pallas_full
    fk.raisr_pass_pallas_full = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        cfg = RaisrConfig(
            filterfolder=os.path.join(REFERENCE_ROOT, kw["folder"]),
            passes=2, backend="pallas", dtype="int8",
        )
        mine = RaisrEngine(cfg).process(Frame(y=yp)).y.astype(int)
    finally:
        fk.raisr_pass_pallas_full = orig

    p_ref16 = _psnr(ref_fp16, ref_f32, 255.0)
    p_mine = _psnr(mine, ref_f32, 255.0)
    d_ref16 = np.abs(ref_fp16 - ref_f32).max()
    d_mine = np.abs(mine - ref_f32).max()
    print(f"i8 vs ref f32: {p_mine:.1f} dB max {d_mine}; "
          f"ref fp16 envelope: {p_ref16:.1f} dB max {d_ref16}")
    assert p_mine >= p_ref16, (p_mine, p_ref16)
    assert d_mine <= d_ref16, (d_mine, d_ref16)
