"""Sharding-layer work-conservation sanity on the virtual CPU mesh.

This host exposes ONE physical core, so an 8-device CPU mesh timeshares a
single core: wall-clock SPEEDUP is not measurable here (that needs real
chips — see docs/PERFORMANCE.md's multi-chip section). What IS measurable,
and what this tool reports, is **work conservation**: for a fixed total
batch, wall time must stay ~flat as the mesh splits the work across more
virtual devices. A flat profile means the data-parallel split duplicates no
compute and the row-stripe halos add only their predicted overhead
(halo rows / stripe rows); a rising profile would flag redundant work or
collective overhead in the shard_map decomposition.

The decomposition itself is value-validated elsewhere (tests/test_sharding
bit-identity; tools/tpu_check.py row_sharded_stripe on real Mosaic).

Run: python tools/shard_scaling_cpu.py  (takes ~2 min; prints a table)
"""

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.loader import load_model
from raisr_tpu.ops.pipeline import pass_statics, process_plane_y_batch
from raisr_tpu.parallel.sharding import (
    make_mesh,
    process_batch_dp,
    process_batch_2d,
)

FOLDER = "/root/reference/filters_2x/filters_highres"
H, W = 270, 480  # LR frames; 8 of them = one 540p-class batch of work


def main():
    cfg = RaisrConfig(filterfolder=FOLDER, passes=2, backend="reference")
    model = load_model(FOLDER, cfg)
    statics = pass_statics(cfg, model, "reference")
    filters = tuple(jnp.asarray(b.filters) for b in model.banks)
    qstr = tuple(jnp.asarray(b.qstr) for b in model.banks)
    qcoh = tuple(jnp.asarray(b.qcoh) for b in model.banks)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(16, 235, (8, H, W)).astype(np.float32)
    )

    def timed(name, fn):
        fn(batch).block_until_ready()  # compile + warm
        best = min(
            (lambda t0: (fn(batch + jnp.float32(r)).block_until_ready(),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for r in range(3)
        )
        print(f"{name:34s} {best * 1000:8.0f} ms", flush=True)
        return best

    base = timed(
        "unsharded batched (1 device)",
        lambda b: process_plane_y_batch(
            b, filters, qstr, qcoh, statics, 2, 1, 2 * H, 2 * W
        ),
    )
    results = {"unsharded": base}
    for n in (2, 4, 8):
        mesh = make_mesh(n, ("data",))
        results[f"dp{n}"] = timed(
            f"data={n} (dp over {n} virtual devices)",
            lambda b, m=mesh: process_batch_dp(
                b, filters, qstr, qcoh, statics, 2, 1, 2 * H, 2 * W, m
            ),
        )
    results["2d"] = timed(
        "data=4,rows=2 (2-D, halo exchange)",
        lambda b: process_batch_2d(
            b, filters, qstr, qcoh, statics, 2, 1, 2 * H, 2 * W,
            make_mesh_2d(),
        ),
    )
    worst = max(v / base for k, v in results.items())
    print(f"\nwork-conservation ratio (worst/unsharded): {worst:.2f}x "
          "(~1.0 = no redundant compute; single-core host, so wall time "
          "measures TOTAL work, not latency)")


def make_mesh_2d():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "rows"))


if __name__ == "__main__":
    main()
