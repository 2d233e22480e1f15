"""Throughput of the production batched engine path (guard-banded frame
stack, per-frame zone masks) on real TPU, across precision tiers.

Prints ms/frame and fps for 1080p->4K on engine.process_batch_y.
"""

import sys
import time

import numpy as np
import jax
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


def bench(name, cfg):
    if ONLY and ONLY not in name:
        return
    eng = RaisrEngine(cfg)
    salt = float(time.time_ns() % 100003) / 1000.0
    rng = np.random.default_rng(0)
    hi = 235 if cfg.bits == 8 else 940
    batch = jnp.asarray(
        np.clip(
            rng.integers(16, hi, (N, H, W)).astype(np.float32) + salt, 0, hi
        )
    )
    fence(eng.process_batch_y(batch))
    times = []
    for rep in range(5):
        fresh = batch + float(rep + 1) * 0.125
        fence(fresh)
        t0 = time.perf_counter()
        fence(eng.process_batch_y(fresh))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{name}: {1000 * t / N:.2f} ms/frame ({N / t:.1f} fps, batch {N})")


bench("8-bit  f32-grade 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas"))
bench("8-bit  bf16-tier 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                  dtype="bfloat16"))
bench("10-bit f32-grade 2-pass",
      RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas", bits=10))
bench("10-bit f32-grade 1-pass",
      RaisrConfig(filterfolder=FOLDER, passes=1, backend="pallas", bits=10))
bench("1.5x   f32-grade 1-pass",
      RaisrConfig(filterfolder=FOLDER15, ratio=1.5, passes=1,
                  backend="pallas"))
