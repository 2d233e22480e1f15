"""On-TPU validation + benchmark suite (single process, fenced timings).

Run on real TPU hardware: python tools/tpu_check.py
All timings fence via host fetches (remote-execution backends no-op
block_until_ready and cache identical dispatches).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def fence(x):
    return float(jnp.sum(x))


def log(*a):
    print(*a, flush=True)


def check_kernel_correctness():
    from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas
    from raisr_tpu.ops.filter_apply import apply_filters_taps

    rng = np.random.default_rng(0)
    for pixel_types, ratio, passes in [(4, 2, 2), (1, 1, 2), (4, 2, 3)]:
        h, w = 64, 128
        img = jnp.asarray(rng.integers(0, 1023 if passes == 3 else 255, size=(h, w)).astype(np.float32))
        bkt = jnp.asarray(rng.integers(0, 216, size=(h, w)).astype(np.int32))
        filters = np.zeros((216 * pixel_types, 128), np.float32)
        filters[:, :121] = rng.normal(size=(216 * pixel_types, 121)).astype(np.float32) * 0.01
        filters = jnp.asarray(filters)
        if pixel_types == 4:
            pt = ((np.arange(h)[:, None] - 5) % 2) * 2 + (np.arange(w)[None, :] - 5) % 2
        else:
            pt = np.zeros((h, w), np.int32)
        idx = jnp.asarray(np.asarray(bkt) * pixel_types + pt)
        ref = np.asarray(apply_filters_taps(img, idx, filters, 11))
        out = np.asarray(apply_filters_pallas(img, bkt, filters, pixel_types=pixel_types, ratio=ratio, mxu_passes=passes))
        d = np.abs(out[6:-6, 6:-6] - ref[6:-6, 6:-6]).max()
        log(f"kernel correctness pt={pixel_types} passes={passes}: max abs diff {d:.5f}")
        assert d < 0.05, d


def bench_kernel():
    from raisr_tpu.ops.pallas.filter_kernel import apply_filters_pallas

    rng = np.random.default_rng(0)
    h, w = 2160, 3840
    img0 = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.float32))
    filters = np.zeros((216 * 4, 128), np.float32)
    filters[:, :121] = rng.normal(size=(216 * 4, 121)).astype(np.float32) * 0.01
    filters = jnp.asarray(filters)
    buckets = jnp.asarray(rng.integers(0, 216, size=(h, w)).astype(np.int32))

    # NOTE: while-loop (scan) bodies make XLA stack-allocate pallas outputs
    # in VMEM -> OOM; bench with sequential async dispatches instead.
    N = 10
    from raisr_tpu.ops.jit_utils import tpu_jit
    fn = tpu_jit(lambda i: apply_filters_pallas(i, buckets, filters, mxu_passes=2))
    offs = [jnp.float32(i) for i in range(N + 1)]
    t0 = time.time(); fence(fn(img0)); log(f"kernel 4K compile: {time.time()-t0:.0f}s")
    for rep in range(2):
        base = img0 + float(100 + rep); fence(base)
        t0 = time.time()
        acc = []
        for i in range(N):
            acc.append(fn(base + offs[i])[0, 0])
        float(sum(acc))  # forces all N executions
        dt = (time.time() - t0) / N
        log(f"kernel 4K filter-apply: {dt*1000:.2f} ms (incl per-call input add)")


def bench_pipeline():
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model
    from raisr_tpu.ops.pipeline import pass_statics, process_plane_y

    folder = "/root/reference/filters_2x/filters_highres"
    cfg = RaisrConfig(filterfolder=folder, passes=2)
    model = load_model(folder, cfg)
    statics = pass_statics(cfg, model, "pallas")
    filters = tuple(jnp.asarray(b.filters) for b in model.banks)
    qstr = tuple(jnp.asarray(b.qstr) for b in model.banks)
    qcoh = tuple(jnp.asarray(b.qcoh) for b in model.banks)

    rng = np.random.default_rng(0)
    frame0 = jnp.asarray(rng.integers(16, 235, size=(1080, 1920)).astype(np.float32))

    N = 10
    def fn(y):
        return process_plane_y(y, filters, qstr, qcoh, statics, 2, 1, 2160, 3840)
    offs = [jnp.float32(i) for i in range(N + 1)]
    t0 = time.time(); fence(fn(frame0)); log(f"pipeline compile: {time.time()-t0:.0f}s")
    for rep in range(2):
        base = frame0 + float(100 + rep); fence(base)
        t0 = time.time()
        acc = []
        for i in range(N):
            acc.append(fn(base + offs[i])[0, 0])
        float(sum(acc))
        dt = (time.time() - t0) / N
        log(f"full 1080p->4K 2-pass frame: {dt*1000:.2f} ms -> {1/dt:.1f} fps")


def check_pipeline_quality():
    """Full pallas pipeline vs the exact taps pipeline (golden fixture input):
    deviations are bucket flips at fp ties; PSNR must stay ~lossless."""
    import os
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model
    from raisr_tpu.ops.pipeline import pass_statics, process_plane_y
    from raisr_tpu.utils.metrics import psnr

    data = np.load(
        os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                     "2x_highres_p2_b2_8bit.npz")
    )
    folder = "/root/reference/filters_2x/filters_highres"
    cfg = RaisrConfig(filterfolder=folder, passes=2)
    model = load_model(folder, cfg)
    statics = pass_statics(cfg, model, "pallas")
    filters = tuple(jnp.asarray(b.filters) for b in model.banks)
    qstr = tuple(jnp.asarray(b.qstr) for b in model.banks)
    qcoh = tuple(jnp.asarray(b.qcoh) for b in model.banks)
    lr = jnp.asarray(data["lr"].astype(np.float32))
    out = np.asarray(
        process_plane_y(lr, filters, qstr, qcoh, statics, 2, 1, 64, 96)
    ).astype(np.uint8)
    expected = data["expected"]
    mismatch = (out != expected).mean()
    p = psnr(out, expected, 255.0)
    log(f"pipeline quality vs exact: {mismatch:.4%} pixels differ, PSNR {p:.1f} dB")
    assert p > 50.0 or mismatch == 0.0, (mismatch, p)


def bench_dispatch_overhead():
    # per-dispatch + fence overhead of the remote tunnel, to subtract
    noop = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 128), jnp.float32)
    fence(noop(x))
    N = 20
    t0 = time.time()
    acc = [noop(x + jnp.float32(i))[0, 0] for i in range(N)]
    float(sum(acc))
    log(f"dispatch overhead: {(time.time()-t0)/N*1000:.2f} ms/call")


def check_full_kernel_on_hw():
    """Whole-pass fused kernel vs the exact taps pipeline ON REAL TPU
    (the pytest suite validates it in interpret mode on CPU only)."""
    import dataclasses

    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model
    from raisr_tpu.ops.pipeline import pass_statics, raisr_pass

    folder = "/root/reference/filters_2x/filters_highres"
    cfg = RaisrConfig(filterfolder=folder)
    model = load_model(folder, cfg)
    bank = model.banks[0]
    statics_p = pass_statics(cfg, model, "pallas")
    statics_t = dataclasses.replace(statics_p, backend="taps")

    rng = np.random.default_rng(7)
    img = jnp.asarray(
        np.clip(rng.normal(128, 40, (256, 512)), 16, 235)
        .round().astype(np.float32)
    )
    args = (jnp.asarray(bank.filters), jnp.asarray(bank.qstr),
            jnp.asarray(bank.qcoh))
    ref = np.asarray(jax.jit(
        lambda y: raisr_pass(y, *args, statics_t, 0))(img))
    from raisr_tpu.ops.jit_utils import tpu_jit
    out = np.asarray(tpu_jit(
        lambda y: raisr_pass(y, *args, statics_p, 0))(img))
    d = np.abs(out - ref)
    frac = (d > 0).mean()
    log(f"full kernel vs taps ON TPU: max {d.max():.3f}, frac>0 {frac:.5f}")
    # identical f32 math; only fp-tie bucket flips may differ
    assert frac < 0.02, frac
    assert np.median(d) == 0.0


if __name__ == "__main__":
    log("device:", jax.devices()[0])
    t_all = time.time()
    bench_dispatch_overhead()
    check_kernel_correctness()
    check_full_kernel_on_hw()
    check_pipeline_quality()
    bench_kernel()
    bench_pipeline()
    log(f"total {time.time()-t_all:.0f}s")
