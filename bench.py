"""Benchmark: 1080p -> 4K, passes=2, filters_2x/filters_highres, per chip.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}

Baseline: the reference needs a 32-vCPU C7i (or ~full Xeon socket share) for
60 fps of this workload (reference docs/performance.md:26); BASELINE.md sets
the target at >= 60 fps sustained per TPU v5e chip.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 60.0


def main():
    import jax
    import jax.numpy as jnp
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import load_model
    from raisr_tpu.ops.pipeline import pass_statics, process_plane_y

    from jax import lax

    folder = "/root/reference/filters_2x/filters_highres"
    cfg = RaisrConfig(filterfolder=folder, passes=2)
    model = load_model(folder, cfg)
    backend = "taps" if jax.default_backend() == "cpu" else "pallas"
    statics = pass_statics(cfg, model, backend)
    filters = tuple(jnp.asarray(b.filters) for b in model.banks)
    qstr = tuple(jnp.asarray(b.qstr) for b in model.banks)
    qcoh = tuple(jnp.asarray(b.qcoh) for b in model.banks)

    lr_h, lr_w = 1080, 1920
    out_h, out_w = 2160, 3840
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(16, 235, size=(lr_h, lr_w)).astype(np.float32))

    n_iters = 10 if jax.default_backend() != "cpu" else 2

    # Timing notes: remote-execution backends may no-op block_until_ready and
    # cache identical dispatches, so every iteration gets a distinct input
    # and the loop is fenced by a host fetch that depends on all outputs.
    # (scan-wrapping is avoided: while-loop bodies stack-allocate pallas
    # outputs in VMEM on this toolchain.)
    def fn(y):
        return process_plane_y(
            y, filters, qstr, qcoh, statics, cfg.passes, cfg.two_pass_mode,
            out_h, out_w,
        )
    float(jnp.sum(fn(frame)))  # compile + warm
    base = frame + 100.0
    float(jnp.sum(base))  # drain queue
    offs = [jnp.float32(i) for i in range(n_iters)]
    start = time.perf_counter()
    acc = [fn(base + offs[i])[0, 0] for i in range(n_iters)]
    float(sum(acc))  # forces all executions
    elapsed = time.perf_counter() - start
    fps = n_iters / elapsed

    print(
        json.dumps(
            {
                "metric": "1080p->4K 2-pass Y-plane frames/sec/chip (filters_2x/filters_highres, CoBC blend)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
