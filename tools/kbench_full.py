"""A/B microbenchmark for the whole-pass fused kernels on real TPU.

Times one fused RAISR pass on an N-frame tall 4K (default) cheap plane,
fenced with host fetches and distinct inputs per rep (axon methodology, see
bench.py / docs/PERFORMANCE.md). Prints ms per single-frame pass.

Every shipped tier is benchable at kernel level:

    python tools/kbench_full.py --tier f32          # mxu2 f32-grade (8-bit)
    python tools/kbench_full.py --tier bf16         # mxu1 fast tier
    python tools/kbench_full.py --tier i8           # int8-pair tier
    python tools/kbench_full.py --tier p10          # p_split 10-bit fast
    python tools/kbench_full.py --tier f32-10       # mxu3 10-bit f32-grade
    python tools/kbench_full.py --tier 15x          # single-phase 1.5x

plus geometry/schedule knobs (--tb2/--rowbatch/--cchunk/--gchunk/--mxu,
--ftrans) and --ablate <stage> (sets RAISR_ABLATE before kernel import:
nocopy/noselect/nomxu/pair/vconv_mxu) for stage decompositions.
"""

import argparse
import os
import sys
import time

p = argparse.ArgumentParser(description=__doc__)
p.add_argument("--tier", default=None,
               choices=["f32", "bf16", "i8", "p10", "fast10", "f32-10",
                        "15x"],
               help="preset: tier defaults for mxu/p_split/i8/bits/bank")
p.add_argument("--tb2", type=int, default=0, help="half band rows (0=tier default)")
p.add_argument("--rowbatch", type=int, default=0)
p.add_argument("--mxu", type=int, default=0, help="mxu_passes (0=tier default)")
p.add_argument("--cchunk", type=int, default=0)
p.add_argument("--gchunk", type=int, default=0)
p.add_argument("--ftrans", action="store_true")
p.add_argument("--pcenter", type=float, default=0.0,
               help=">0: center patches pre-bf16-cast (10-bit single-slot)")
p.add_argument("--ablate", default="", help="RAISR_ABLATE stage to skip/flip")
p.add_argument("--size", default="4k", choices=["4k", "8k"],
               help="cheap-plane (output) size per frame")
p.add_argument("--frames", type=int, nargs=2, default=(4, 12),
               metavar=("N_SMALL", "N_BIG"), help="slope batch sizes")
# legacy positional form: tb2 [rowbatch [mxu [cchunk [flags...]]]]
argv = sys.argv[1:]
if argv and not argv[0].startswith("-"):
    legacy = argparse.Namespace(
        tier=None, tb2=int(argv[0]),
        rowbatch=int(argv[1]) if len(argv) > 1 else 0,
        mxu=int(argv[2]) if len(argv) > 2 else 2,
        cchunk=int(argv[3]) if len(argv) > 3 else 0,
        gchunk=0, ftrans="ftrans" in argv[4:], ablate="",
        size="4k", frames=(4, 12), pcenter=0.0,
    )
    legacy.p_split = "psplit" in argv[4:]
    legacy.i8 = "i8" in argv[4:]
    args = legacy
else:
    args = p.parse_args(argv)
    args.p_split = False
    args.i8 = False

TIERS = {
    # tier: (mxu_passes, p_split, i8, bits, tb2, folder)
    "f32": (2, False, False, 8, 40, "filters_2x/filters_highres"),
    "bf16": (1, False, False, 8, 40, "filters_2x/filters_highres"),
    "i8": (1, False, True, 8, 40, "filters_2x/filters_highres"),
    "p10": (2, True, False, 10, 40, "filters_2x/filters_highres"),
    # 10-bit single-slot fast tier: patches centered at 512 pre-bf16-cast
    "fast10": (1, False, False, 10, 40, "filters_2x/filters_highres"),
    "f32-10": (3, False, False, 10, 32, "filters_2x/filters_highres"),
    "15x": (2, False, False, 8, 16, "filters_1.5x/filters_highres"),
}
FOLDER = "/root/reference/filters_2x/filters_highres"
BITS = 8
if args.tier:
    mxu_t, args.p_split, args.i8, BITS, tb2_t, fld = TIERS[args.tier]
    if args.mxu == 0:
        args.mxu = mxu_t
    if args.tb2 == 0:
        args.tb2 = tb2_t
    if args.tier == "fast10" and args.pcenter == 0.0:
        args.pcenter = 512.0
    FOLDER = os.path.join("/root/reference", fld)
else:
    if args.mxu == 0:
        args.mxu = 2
    if args.tb2 == 0:
        args.tb2 = 8

if args.ablate:
    os.environ["RAISR_ABLATE"] = args.ablate  # must precede kernel import

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
from raisr_tpu.ops.pallas.full_kernel import (
    raisr_pass_pallas_full,
    raisr_pass_pallas_full_single,
)
from raisr_tpu.ops.jit_utils import tpu_jit

SINGLE = args.tier == "15x"
H, W = (4320, 7680) if args.size == "8k" else (2160, 3840)
if SINGLE:
    H, W = (H * 3 // 4, W * 3 // 4)  # 1.5x of the same LR source
N_SMALL, N_BIG = args.frames

cfg = RaisrConfig(
    filterfolder=FOLDER, passes=2, bits=BITS,
    ratio=1.5 if SINGLE else 2.0,
)
model = load_model(FOLDER, cfg)
bank = model.banks[0]
filters = jnp.asarray(bank.filters)
k1d = tuple(float(x) for x in gaussian_kernel_1d(11))
nf = float(normalization_factor(BITS))
qstr = tuple(float(x) for x in bank.qstr)
qcoh = tuple(float(x) for x in bank.qcoh)
lo, hi = {8: (16, 235), 10: (64, 940)}[BITS]
min_val, max_val = lo, hi


@tpu_jit
def fn(cheap):
    if SINGLE:
        return raisr_pass_pallas_full_single(
            cheap, filters, k1d, nf, qstr, qcoh,
            mxu_passes=args.mxu, tb2=args.tb2,
            min_val=min_val, max_val=max_val, p_split=args.p_split,
        )
    return raisr_pass_pallas_full(
        cheap, filters, k1d, nf, qstr, qcoh,
        mxu_passes=args.mxu, tb2=args.tb2, rowbatch=args.rowbatch,
        cchunk=args.cchunk, gchunk=args.gchunk,
        min_val=min_val, max_val=max_val,
        p_split=args.p_split, ftrans=args.ftrans, i8=args.i8,
        pcenter=args.pcenter,
    )


def fence(x):
    return float(jnp.sum(x))


salt = float(time.time_ns() % 100003) / 1000.0
rng = np.random.default_rng(0)
base = np.clip(
    rng.integers(lo, hi, (N_BIG * H, W)).astype(np.float32) + salt, 0, hi
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
    f"tier={args.tier or '-'} size={args.size} tb2={args.tb2} "
    f"rowbatch={args.rowbatch} mxu={args.mxu} cchunk={args.cchunk} "
    f"gchunk={args.gchunk}"
    f"{' psplit' if args.p_split else ''}{' ftrans' if args.ftrans else ''}"
    f"{' i8' if args.i8 else ''}"
    f"{' ablate=' + args.ablate if args.ablate else ''}: "
    f"{1000 * per_frame:.3f} ms/pass-frame (slope {N_SMALL}->{N_BIG}; "
    f"raw {1000 * t_small:.1f} / {1000 * t_big:.1f} ms)"
)
