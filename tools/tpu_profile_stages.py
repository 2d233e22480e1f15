"""Stage-by-stage TPU timing of the pipeline (tall-frame, fenced)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.loader import load_model
from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor
from raisr_tpu.ops.pipeline import pass_statics, processed_col_end
from raisr_tpu.ops import hashing, census
from raisr_tpu.ops.resize import cheap_upscale
from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas
from raisr_tpu.ops.jit_utils import tpu_jit

N = 4  # frames stacked
H, W = 1080 * N, 1920
OH, OW = H * 2, W * 2

folder = "/root/reference/filters_2x/filters_highres"
cfg = RaisrConfig(filterfolder=folder, passes=2)
model = load_model(folder, cfg)
s = pass_statics(cfg, model, "pallas")
bank = model.banks[0]
filters = jnp.asarray(bank.filters)
qstr = jnp.asarray(bank.qstr)
qcoh = jnp.asarray(bank.qcoh)
k1d = gaussian_kernel_1d(11)
nf = normalization_factor(8)


def stage_resize(y):
    return cheap_upscale(y, OH, OW, 8)


def stage_tensor(y):
    cheap = stage_resize(y)
    gx, gy = hashing.gradients(cheap)
    a, b, d = hashing.structure_tensor_separable(gx, gy, k1d, nf)
    return a + b + d


def stage_hash(y):
    cheap = stage_resize(y)
    gx, gy = hashing.gradients(cheap)
    a, b, d = hashing.structure_tensor_separable(gx, gy, k1d, nf)
    return hashing.hash_buckets(a, b, d, qstr, qcoh, 24, 3, 3).astype(jnp.float32)


def stage_filter(y):
    cheap = stage_resize(y)
    gx, gy = hashing.gradients(cheap)
    a, b, d = hashing.structure_tensor_separable(gx, gy, k1d, nf)
    buckets = hashing.hash_buckets(a, b, d, qstr, qcoh, 24, 3, 3)
    return apply_filters_pallas(cheap, buckets, filters, mxu_passes=2)


def stage_full(y):
    cheap = stage_resize(y)
    gx, gy = hashing.gradients(cheap)
    a, b, d = hashing.structure_tensor_separable(gx, gy, k1d, nf)
    buckets = hashing.hash_buckets(a, b, d, qstr, qcoh, 24, 3, 3)
    raw = apply_filters_pallas(cheap, buckets, filters, mxu_passes=2)
    keep = (raw > 16.0) & (raw < 235.0)
    raisr_px = jnp.where(keep, raw, cheap)
    hr = raisr_px  # proc mask omitted: negligible
    blended = census.blend_count_of_bits_changed(cheap, hr)
    return jnp.clip(jnp.floor(blended + 0.5), 16.0, 235.0)


def fence(x):
    return float(jnp.sum(x))


def bench(name, fn):
    f = tpu_jit(fn)
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.integers(16, 235, size=(H, W)).astype(np.float32))
    fence(f(y0))
    times = []
    for rep in range(3):
        fresh = y0 + float(rep + 1)
        fence(fresh)
        t0 = time.perf_counter()
        fence(f(fresh))
        times.append(time.perf_counter() - t0)
    print(f"{name:12s}: {min(times)*1000/N:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    noop = jax.jit(lambda x: x + 1.0)
    small = jnp.ones((8, 128), jnp.float32)
    fence(noop(small))
    t0 = time.perf_counter()
    for i in range(3):
        fence(noop(small + float(i)))
    print(f"overhead: {(time.perf_counter()-t0)/3*1000:.1f} ms/dispatch", flush=True)

    bench("resize", stage_resize)
    bench("tensor", stage_tensor)
    bench("hash", stage_hash)
    bench("filter", stage_filter)
    bench("full-1pass", stage_full)
