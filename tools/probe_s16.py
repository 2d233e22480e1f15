"""Probe: which integer dot_general modes does real Mosaic support, and at
what relative rate?

Motivation (NOTES.md i8 tier): the current int8-pair tier M-stacks hi/lo
int8 filters ([1728, 144] @ [144, N] -> i32) and combines 256*hi + lo. If
Mosaic lowers dot_general(int16, int8) -> int32 natively, the tier could
run ONE [864, 144] matmul with exact int16 fixed-point filters - the same
slot count as the bf16 tier, no combine, half the gt bytes of the pair
form. This probe checks correctness and relative rate on real hardware.

Usage: python tools/probe_s16.py    (TPU env; see tools/post_outage.sh)
"""

import os
import time
import functools

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

M, K, N = 864, 144, 512
REPS = 16  # matmuls per kernel call; gt pinned per unrolled
           # iteration (NOTES landmine #3): 16 x 1.7 MB < the
           # 124 MB scoped-VMEM limit tpu_jit sets


def _kernel(lt, rt, o_ref, *, ldt, rdt, odt):
    l = lt[...]
    r = rt[...]
    acc = None
    for i in range(REPS):
        # vary one operand per rep so Mosaic can't hoist the matmul
        rr = r + rdt(i % 3)
        gt = lax.dot_general(l, rr, (((1,), (0,)), ((), ())),
                             preferred_element_type=odt)
        acc = gt if acc is None else acc + gt
    o_ref[...] = acc


def run(name, ldt, rdt, odt):
    rng = np.random.default_rng(0)
    lv = rng.integers(-120, 120, (M, K)).astype(np.int32)
    rv = rng.integers(-120, 120, (K, N)).astype(np.int32)
    if ldt == jnp.bfloat16:
        lv = lv.astype(np.float32)
        rv = rv.astype(np.float32)
    l = jnp.asarray(lv, ldt)
    r = jnp.asarray(rv, rdt)

    fn = pl.pallas_call(
        functools.partial(_kernel, ldt=ldt, rdt=rdt, odt=odt),
        out_shape=jax.ShapeDtypeStruct((M, N), odt),
    )
    from raisr_tpu.ops.jit_utils import tpu_jit
    jfn = tpu_jit(fn)
    try:
        out = np.asarray(jfn(l, r))
    except Exception as e:  # lowering/compile failure = unsupported
        print(f"{name}: UNSUPPORTED ({type(e).__name__}: {str(e)[:160]})")
        return None
    # correctness vs numpy (same rep schedule)
    acc = None
    for i in range(REPS):
        gt = lv.astype(np.int64) @ (rv + (i % 3)).astype(np.int64)
        acc = gt if acc is None else acc + gt
    if odt == jnp.float32:
        ok = np.allclose(out, acc.astype(np.float64), rtol=1e-2, atol=1e2)
    else:
        ok = np.array_equal(out.astype(np.int64), acc)
    # rate: min-of-5 fenced timings (identical dispatch caching: vary input)
    times = []
    for rep in range(5):
        l2 = jnp.asarray(lv + rep + 1, ldt)
        t0 = time.perf_counter()
        float(jnp.sum(jfn(l2, r).astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1000
    print(f"{name}: ok={ok} {ms:.2f} ms/call ({REPS} matmuls of "
          f"[{M},{K}]@[{K},{N}])")
    return ms


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    run("bf16xbf16->f32", jnp.bfloat16, jnp.bfloat16, jnp.float32)
    run("s8xs8->s32    ", jnp.int8, jnp.int8, jnp.int32)
    run("s16xs8->s32   ", jnp.int16, jnp.int8, jnp.int32)
    run("s16xs16->s32  ", jnp.int16, jnp.int16, jnp.int32)
    run("s32xs8->s32   ", jnp.int32, jnp.int8, jnp.int32)
