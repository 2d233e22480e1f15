"""Throughput of the production batched engine path (guard-banded frame
stack, per-frame zone masks) on real TPU, across precision tiers.

Prints ms/frame and fps for 1080p->4K on engine.process_batch_y, plus
BASELINE config-5 rows (4K->8K, the w=7680 tb2=24 wide-kernel geometry;
filter with `8K`). Usage: python tools/batch_bench.py [FILTER [N]].
"""

import sys
import time

import os

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import RaisrEngine

ONLY = sys.argv[1] if len(sys.argv) > 1 else None  # substring filter
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W = 1080, 1920
FOLDER = "/root/reference/filters_2x/filters_highres"
FOLDER15 = "/root/reference/filters_1.5x/filters_highres"


def fence(x):
    return float(jnp.sum(x))


def bench(name, cfg, h=None, w=None):
    """Per-frame time from the slope between two batch sizes — cancels the
    remote-execution tunnel's large per-dispatch+fence overhead."""
    if ONLY and ONLY not in name:
        return
    h, w = h or H, w or W
    eng = RaisrEngine(cfg)
    salt = float(time.time_ns() % 100003) / 1000.0
    rng = np.random.default_rng(0)
    hi = 235 if cfg.bits == 8 else 940
    base = np.clip(
        rng.integers(16, hi, (N, h, w)).astype(np.float32) + salt, 0, hi
    )

    def measure(n):
        batch = jnp.asarray(base[:n])
        fence(eng.process_batch_y(batch))
        times = []
        for rep in range(5):
            fresh = batch + float(rep + 1) * 0.125
            fence(fresh)
            t0 = time.perf_counter()
            fence(eng.process_batch_y(fresh))
            times.append(time.perf_counter() - t0)
        return min(times)

    n_small = max(2, N // 4)
    t_small = measure(n_small)
    t_big = measure(N)
    per = (t_big - t_small) / (N - n_small)
    print(
        f"{name}: {1000 * per:.2f} ms/frame ({1 / per:.1f} fps; "
        f"slope {n_small}->{N}, raw {1000 * t_small:.0f}/{1000 * t_big:.0f} ms)"
    )


def bench_full_yuv(name, cfg, h=None, w=None):
    """Full 4:2:0 frame (Y RAISR + both chroma cheap upscales) — the
    reference's per-frame unit of work (RNLProcess handles Y segments and
    UV IPP resize per frame, Raisr.cpp:1361-1396)."""
    if ONLY and ONLY not in name:
        return
    h, w = h or H, w or W
    eng = RaisrEngine(cfg)
    salt = float(time.time_ns() % 100003) / 1000.0
    rng = np.random.default_rng(0)
    base_y = np.clip(
        rng.integers(16, 235, (N, h, w)).astype(np.float32) + salt, 0, 235
    )
    base_uv = np.clip(
        rng.integers(16, 240, (2 * N, h // 2, w // 2)).astype(np.float32)
        + salt, 0, 240,
    )

    def run(y, uv):
        return fence(eng.process_batch_y(y)) + fence(eng.process_batch_uv(uv))

    def measure(n):
        y = jnp.asarray(base_y[:n])
        uv = jnp.asarray(base_uv[: 2 * n])
        run(y, uv)
        times = []
        for rep in range(5):
            fy = y + float(rep + 1) * 0.125
            fuv = uv + float(rep + 1) * 0.125
            fence(fy), fence(fuv)
            t0 = time.perf_counter()
            run(fy, fuv)
            times.append(time.perf_counter() - t0)
        return min(times)

    n_small = max(2, N // 4)
    t_small = measure(n_small)
    t_big = measure(N)
    per = (t_big - t_small) / (N - n_small)
    print(
        f"{name}: {1000 * per:.2f} ms/frame ({1 / per:.1f} fps; "
        f"slope {n_small}->{N}, raw {1000 * t_small:.0f}/{1000 * t_big:.0f} ms)"
    )


def bench_device_yuv(name, cfg, h=None, w=None, n_big=None):
    """Full 4:2:0 frame through engine.process_batch_device — Y RAISR +
    both chroma upscales + uint8 pack/unpack in ONE jit (the device-resident
    serving step, the analogue of the reference's full-frame RNLProcess,
    Raisr.cpp:1294-1397 with UV at :1373-1388). This is the headline
    bench.py methodology; kept here for tier sweeps."""
    if ONLY and ONLY not in name:
        return
    h, w = h or H, w or W
    n_big = n_big or N
    eng = RaisrEngine(cfg)
    salt = int(time.time_ns() % 97)
    rng = np.random.default_rng(0)
    dt = np.uint8 if cfg.bits == 8 else np.uint16
    lo, hi, top = (16, 235, 255) if cfg.bits == 8 else (64, 940, 1023)
    base_y = np.clip(
        rng.integers(lo, hi, (n_big, h, w)) + salt, 0, top
    ).astype(dt)
    base_u = np.clip(
        rng.integers(lo, hi + 5, (n_big, h // 2, w // 2)) + salt, 0, top
    ).astype(dt)
    base_v = np.clip(
        rng.integers(lo, hi + 5, (n_big, h // 2, w // 2)) + 2 * salt, 0, top
    ).astype(dt)

    def run(y, u, v):
        oy, ou, ov = eng.process_batch_device(y, u, v)
        return fence(oy) + fence(ou) + fence(ov)

    def measure(n):
        y, u, v = (jnp.asarray(a[:n]) for a in (base_y, base_u, base_v))
        run(y, u, v)
        times = []
        for rep in range(5):
            d = rep + 1
            fy, fu, fv = (
                jnp.clip(a + dt(d), 0, top) for a in (y, u, v)
            )
            fence(fy), fence(fu), fence(fv)
            t0 = time.perf_counter()
            run(fy, fu, fv)
            times.append(time.perf_counter() - t0)
        return min(times)

    n_small = max(2, n_big // 4)
    t_small = measure(n_small)
    t_big = measure(n_big)
    per = (t_big - t_small) / (n_big - n_small)
    print(
        f"{name}: {1000 * per:.2f} ms/frame ({1 / per:.1f} fps; "
        f"slope {n_small}->{n_big}, raw {1000 * t_small:.0f}/{1000 * t_big:.0f} ms)"
    )


bench("8-bit  f32-grade 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas"))
bench("8-bit  bf16-tier 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                  dtype="bfloat16"))
bench("8-bit  int8-tier 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                  dtype="int8"))
bench("8-bit  f32-grade 1-pass",
      RaisrConfig(filterfolder=FOLDER, passes=1, backend="pallas"))
bench("10-bit fast-tier 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas", bits=10,
                  dtype="bfloat16"))
bench("10-bit f32-grade 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas", bits=10))
bench("10-bit f32-grade 1-pass",
      RaisrConfig(filterfolder=FOLDER, passes=1, backend="pallas", bits=10))
bench("1.5x   f32-grade 1-pass",
      RaisrConfig(filterfolder=FOLDER15, ratio=1.5, passes=1,
                  backend="pallas"))
# BASELINE config 4: denoise pipeline — passes=2 mode=2 runs pass 1 at LR
# size on the denoise bank (denoise-then-upscale, Raisr.cpp:945 pass
# scheduling); the reference claims the bank costs the same as highres
# (docs/performance.md:5) — this row measures it on the TPU path, where
# mode 2 adds a 1080p-sized pass-1 kernel dispatch instead of a 4K one.
bench("denoise mode=2 2-pass",
      RaisrConfig(filterfolder="/root/reference/filters_2x/filters_denoise",
                  passes=2, mode=2, backend="pallas"))
# BASELINE config 2: 720p->1440p yuv420p, passes=1, filters_2x/
# filters_lowres, full YUV plane handling (the reference treats every
# resolution with the same planner, Raisr.cpp:1681-1829; this is the
# lighter-geometry point of that sweep).
bench_full_yuv("720p:  fullYUV420 lowres 1-pass",
               RaisrConfig(
                   filterfolder="/root/reference/filters_2x/filters_lowres",
                   passes=1, backend="pallas"),
               h=720, w=1280)
bench_full_yuv("fullYUV420 bf16-tier 2-pass",
               RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                           dtype="bfloat16"))
# ONE-jit full-YUV420 (the bench.py headline path): Y+U+V uint8 in/out in a
# single compiled step — no per-plane dispatch noise in the slope.
bench_device_yuv("deviceYUV bf16-tier 2-pass",
                 RaisrConfig(filterfolder=FOLDER, passes=2,
                             backend="pallas", dtype="bfloat16"), n_big=32)
bench_device_yuv("deviceYUV int8-tier 2-pass",
                 RaisrConfig(filterfolder=FOLDER, passes=2,
                             backend="pallas", dtype="int8"), n_big=32)
bench_device_yuv("deviceYUV 10-bit fast-tier 2-pass",
                 RaisrConfig(filterfolder=FOLDER, passes=2,
                             backend="pallas", dtype="bfloat16", bits=10),
                 n_big=32)
bench_full_yuv("fullYUV420 f32-grade 2-pass",
               RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas"))

# BASELINE config 5: 4K->8K (w=7680 output triggers the kernel's wide
# tb2=24 wide-band geometry). The FP16-class tier named by the config is bf16; the
# f32-grade and 10-bit fast rows complete the tier sweep. Multi-stream
# sharding over a v5e-8 slice is validated separately (tests/test_sharding
# CPU mesh + __graft_entry__.dryrun_multichip); per-chip throughput here
# IS the per-chip term of that data-parallel scaling (no inter-chip
# communication in DP batched mode).
bench("8K: 4Kto8K bf16-tier 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                  dtype="bfloat16"), h=2160, w=3840)
bench("8K: 4Kto8K f32-grade 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas"),
      h=2160, w=3840)
bench("8K: 4Kto8K fast-tier 10-bit 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas", bits=10,
                  dtype="bfloat16"), h=2160, w=3840)
