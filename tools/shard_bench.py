"""Per-chip throughput of the SHARDED paths on real TPU (1-device mesh).

Closes the round-2 verdict's "no multi-chip path is benchmarked even on one
chip": runs the exact shard_map code paths users get from `--shard` —
process_batch_dp (data axis) and process_batch_2d (data x rows, stripe halo
exchange + the whole-pass fused kernel on stripes) — on a 1-device /
1x1-device Mesh on the real chip, slope-measured against the unsharded
production batched path. With one device every collective (ppermute halo,
bank replication) still executes as a degenerate XLA collective, so this
measures the sharded machinery's per-chip overhead honestly; it cannot
measure ICI scaling (needs real multi-chip — see docs/PERFORMANCE.md).

Run: python tools/shard_bench.py [dp|2d|base] [N]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
from jax.sharding import Mesh

from raisr_tpu.config import RaisrConfig
from raisr_tpu.engine import RaisrEngine
from raisr_tpu.parallel.sharding import process_batch_dp, process_batch_2d

ONLY = sys.argv[1] if len(sys.argv) > 1 else None
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
if N <= 2:
    sys.exit("N must be > 2 (slope needs two distinct batch sizes; "
             f"got N={N}, n_small=max(2, N//4) would equal N)")
_MATCHED = 0
H, W = 1080, 1920
FOLDER = "/root/reference/filters_2x/filters_highres"


def fence(x):
    return float(jnp.sum(x))


def slope(name, fn, base):
    """Per-frame ms from the slope between two batch sizes (cancels the
    tunnel's noisy per-dispatch overhead; see docs/PERFORMANCE.md)."""
    global _MATCHED
    if ONLY and ONLY not in name:
        return
    _MATCHED += 1
    def measure(n):
        batch = jnp.asarray(base[:n])
        fence(fn(batch))  # compile + warm
        times = []
        for rep in range(5):
            fresh = batch + float(rep + 1) * 0.125
            fence(fresh)
            t0 = time.perf_counter()
            fence(fn(fresh))
            times.append(time.perf_counter() - t0)
        return min(times)

    n_small = max(2, N // 4)
    t_small = measure(n_small)
    t_big = measure(N)
    per = (t_big - t_small) / (N - n_small)
    print(
        f"{name}: {1000 * per:.2f} ms/frame ({1 / per:.1f} fps; "
        f"slope {n_small}->{N}, raw {1000 * t_small:.0f}/{1000 * t_big:.0f} ms)",
        flush=True,
    )


def main():
    # bf16 tier = the headline bench's config, so the unsharded row and the
    # DP row reuse bench.py's cached kernel shapes
    cfg = RaisrConfig(filterfolder=FOLDER, passes=2, backend="pallas",
                      dtype="bfloat16")
    eng = RaisrEngine(cfg)
    out_h, out_w = cfg.output_size(H, W)

    salt = float(time.time_ns() % 100003) / 1000.0
    rng = np.random.default_rng(0)
    base = np.clip(
        rng.integers(16, 235, (N, H, W)).astype(np.float32) + salt, 0, 235
    )

    slope("base: unsharded batched (engine.process_batch_y)",
          eng.process_batch_y, base)

    dev = np.asarray(jax.devices()[:1])
    mesh_dp = Mesh(dev.reshape(1), ("data",))
    slope(
        "sharded DP (process_batch_dp, 1-device data mesh)",
        lambda b: process_batch_dp(
            b, eng._filters, eng._qstr, eng._qcoh, eng._statics,
            cfg.passes, cfg.two_pass_mode, out_h, out_w, mesh_dp, "data",
        ),
        base,
    )

    mesh_2d = Mesh(dev.reshape(1, 1), ("data", "rows"))
    slope(
        "sharded 2D (process_batch_2d, 1x1 mesh; stripe halo + fused kernel)",
        lambda b: process_batch_2d(
            b, eng._filters, eng._qstr, eng._qcoh, eng._statics,
            cfg.passes, cfg.two_pass_mode, out_h, out_w, mesh_2d,
            "data", "rows",
        ),
        base,
    )

    if ONLY and _MATCHED == 0:
        sys.exit(f"selector '{ONLY}' matched no benchmark "
                 "(valid substrings: base, dp, 2d)")


if __name__ == "__main__":
    main()
