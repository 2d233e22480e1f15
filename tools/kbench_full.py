"""A/B microbenchmark for the whole-pass fused kernel on real TPU.

Times raisr_pass_pallas_full on an N-frame tall 4K cheap plane, fenced with
host fetches and distinct inputs per rep (axon methodology, see bench.py /
docs/PERFORMANCE.md). Prints ms per single-frame pass.

Usage: python tools/kbench_full.py [tb2] [rowbatch] [mxu_passes]
"""

import os
import sys
import time

import numpy as np
import jax

# persistent compile cache (compiles through the tunnel run 10-25 min cold)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.loader import load_model
from raisr_tpu.model.gaussian import gaussian_kernel_1d, normalization_factor
from raisr_tpu.ops.pallas.full_kernel import raisr_pass_pallas_full
from raisr_tpu.ops.jit_utils import tpu_jit

TB2 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROWBATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 0
MXU = int(sys.argv[3]) if len(sys.argv) > 3 else 2
CCHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 0
PSPLIT = "psplit" in sys.argv[5:]
FTRANS = "ftrans" in sys.argv[5:]
I8 = "i8" in sys.argv[5:]

N_SMALL, N_BIG = 4, 12  # per-frame time = slope between the two batch sizes
H, W = 2160, 3840  # one 4K cheap plane per frame

folder = "/root/reference/filters_2x/filters_highres"
cfg = RaisrConfig(filterfolder=folder, passes=2)
model = load_model(folder, cfg)
bank = model.banks[0]
filters = jnp.asarray(bank.filters)
k1d = tuple(float(x) for x in gaussian_kernel_1d(11))
nf = float(normalization_factor(8))
qstr = tuple(float(x) for x in bank.qstr)
qcoh = tuple(float(x) for x in bank.qcoh)


@tpu_jit
def fn(cheap):
    return raisr_pass_pallas_full(
        cheap, filters, k1d, nf, qstr, qcoh,
        mxu_passes=MXU, tb2=TB2, rowbatch=ROWBATCH, cchunk=CCHUNK,
        p_split=PSPLIT, ftrans=FTRANS, i8=I8,
    )


def fence(x):
    return float(jnp.sum(x))


salt = float(time.time_ns() % 100003) / 1000.0
rng = np.random.default_rng(0)
base = np.clip(
    rng.integers(16, 235, (N_BIG * H, W)).astype(np.float32) + salt, 0, 235
)


def measure(n):
    tall = jnp.asarray(base[: n * H])
    fence(fn(tall))  # compile + warm
    times = []
    for rep in range(5):
        fresh = tall + float(rep + 1) * 0.125
        fence(fresh)
        t0 = time.perf_counter()
        fence(fn(fresh))
        times.append(time.perf_counter() - t0)
    return min(times)


t_small = measure(N_SMALL)
t_big = measure(N_BIG)
per_frame = (t_big - t_small) / (N_BIG - N_SMALL)
print(
    f"tb2={TB2} rowbatch={ROWBATCH} mxu={MXU} cchunk={CCHUNK}"
    f"{' psplit' if PSPLIT else ''}{' ftrans' if FTRANS else ''}"
    f"{' i8' if I8 else ''}: "
    f"{1000 * per_frame:.3f} ms/pass-frame (slope {N_SMALL}->{N_BIG}; "
    f"raw {1000 * t_small:.1f} / {1000 * t_big:.1f} ms)"
)
