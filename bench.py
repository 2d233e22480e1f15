"""Benchmark: 1080p -> 4K FULL YUV420 frames, passes=2,
filters_2x/filters_highres, per chip.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}

Baseline: the reference needs a 32-vCPU C7i (or ~full Xeon socket share) for
60 fps of this workload (reference docs/performance.md:26); BASELINE.md sets
the target at >= 60 fps sustained per TPU v5e chip.

Unit of work: the FULL 4:2:0 frame — RAISR on Y plus the cheap upscale on
both chroma planes, uint8 in / uint8 out — matching the reference's
RNLProcess unit (Raisr.cpp:1294-1397, UV at :1373-1388; the FFmpeg filter
feeds all three planes, vf_raisr.c:226-333). The whole frame runs as ONE
jitted step (engine.process_batch_device: unpack + Y RAISR + U/V + repack
in a single compiled computation), so the slope below measures the fused
serving step with no per-plane dispatch noise.

Tier: the bench runs the bf16 tier (--dtype bfloat16, mxu_passes=1 with
error-diffused filter rounding) — the direct analogue of the tier the
reference itself benches with: on AVX512FP16-capable Xeons the reference
AUTO-SELECTS its half-precision pipeline (Raisr.cpp:1492-1501), which is
the +25% behind its production numbers (docs/performance.md:5). The tier is
quality-qualified against the real thing: our bf16 output is strictly
closer to the reference's f32 AVX-512 output (62.6 dB PSNR, max 6 LSB)
than the reference's own AVX512FP16 output is (54.7 dB, max 8 LSB) —
enforced by tests/test_reference_parity.py::
test_bf16_tier_inside_reference_fp16_envelope against the compiled
reference. The full-precision tier's numbers live in docs/PERFORMANCE.md.

Methodology (see docs/PERFORMANCE.md): the remote-execution tunnel adds
~100 ms per dispatch and may cache identical dispatches, so per-frame time
is the SLOPE between two batch sizes, each fenced by host fetches of all
three output planes. The Y plane rides the PRODUCTION batched path
(engine.process_batch_y inside the device step: guard-banded frame stack
with per-frame zone masks — output bit-identical to per-frame processing,
tests/test_pallas_fused.py::test_full_pass_kernel_frame_stacking), the same
path `raisr upscale --batch N` uses; byte-identity of the one-jit step to
the per-plane host path is asserted in
tests/test_stream.py::test_device_resident_step.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 60.0
N_FRAMES = 32


def main():
    import os

    import jax

    # persistent compilation cache: the slope method compiles two batch
    # shapes (~6-10 min each, first time); cache them across runs
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    # Fail fast if the TPU tunnel is dead: backend init otherwise HANGS
    # forever (no error — observed during the round-3 relay outage), eating
    # the caller's whole timeout budget. Probe init in a bounded subprocess
    # (inherits this env) and abort loudly on failure — never fabricate.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=300,
            )
            alive = probe.returncode == 0
        except subprocess.TimeoutExpired:
            alive = False
        if not alive:
            print(
                "[RAISR ERROR] TPU backend unreachable (tunnel down?) — "
                "bench aborted instead of hanging. See docs/ROUND3.md "
                "outage queue.", file=sys.stderr,
            )
            return 1

    import jax.numpy as jnp
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.engine import RaisrEngine

    folder = "/root/reference/filters_2x/filters_highres"
    backend = "reference" if jax.default_backend() == "cpu" else "pallas"
    # bf16 tier on TPU: the reference's own auto-selected AVX512FP16 tier
    # analogue, quality-qualified (see module docstring)
    dtype = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    cfg = RaisrConfig(filterfolder=folder, passes=2, backend=backend,
                      dtype=dtype)
    engine = RaisrEngine(cfg)

    n = N_FRAMES if jax.default_backend() != "cpu" else 1
    lr_h, lr_w = 1080, 1920
    # per-process salt: remote-execution backends cache identical dispatches
    # ACROSS processes, so inputs must differ between bench runs too
    salt = int(time.time_ns() % 97)
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.clip(
        rng.integers(16, 235, size=(n, lr_h, lr_w)) + salt, 0, 255
    ).astype(np.uint8))
    u = jnp.asarray(np.clip(
        rng.integers(16, 240, size=(n, lr_h // 2, lr_w // 2)) + salt, 0, 255
    ).astype(np.uint8))
    v = jnp.asarray(np.clip(
        rng.integers(16, 240, size=(n, lr_h // 2, lr_w // 2)) + 2 * salt,
        0, 255,
    ).astype(np.uint8))

    def fence(x):
        return float(jnp.sum(x.astype(jnp.uint32)))

    def fn(by, bu, bv):
        oy, ou, ov = engine.process_batch_device(by, bu, bv)
        return fence(oy) + fence(ou) + fence(ov)

    def measure(m):
        by, bu, bv = y[:m], u[:m], v[:m]
        fn(by, bu, bv)  # compile + warm
        times = []
        for rep in range(5):
            d = np.uint8(rep + 1)
            fy, fu, fv = (jnp.clip(a + d, 0, 255) for a in (by, bu, bv))
            fence(fy), fence(fu), fence(fv)
            t0 = time.perf_counter()
            fn(fy, fu, fv)
            times.append(time.perf_counter() - t0)
        return min(times)  # queueing noise is additive

    if n > 1:
        # per-frame time as the slope between two batch sizes: robust
        # against the tunnel's large and NOISY per-dispatch+fence overhead
        # (a point estimate from noop dispatches varies 40-250 ms run to
        # run, which moved earlier headline numbers by >20%)
        n_small = n // 4
        t_small = measure(n_small)
        t_big = measure(n)
        elapsed = (t_big - t_small) / (n - n_small)
        fps = 1.0 / elapsed
    else:
        fps = 1.0 / measure(n)

    print(
        json.dumps(
            {
                "metric": "1080p->4K 2-pass FULL-YUV420 frames/sec/chip, one-jit uint8 in/out (filters_2x/filters_highres, CoBC blend, bf16 tier = reference's auto-selected AVX512FP16 tier)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "tier": "bf16 (mxu_passes=1, error-diffused filter rounding)",
                "quality_basis": (
                    "meets the BASELINE quality criterion directly: "
                    "dPSNR-vs-ground-truth +0.0001 dB vs the AVX-512 "
                    "reference (bar 0.05; tests/test_reference_parity.py::"
                    "test_psnr_vs_ground_truth_fast_tiers), and strictly "
                    "closer to the compiled reference's f32 AVX-512 output "
                    "(62.6 dB, max 6 LSB) than the reference's own "
                    "AVX512FP16 tier is (54.7 dB, max 8 LSB; "
                    "test_bf16_tier_inside_reference_fp16_envelope)"
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
