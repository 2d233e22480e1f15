"""Probe: which integer dot_general operand modes does real Mosaic support?

Motivation (NOTES.md i8 tier): the int8-pair tier M-stacks hi/lo int8
filters ([1728, 144] @ [144, N] -> i32) and combines 256*hi + lo. If
Mosaic lowered dot_general(int16, int8) -> int32 natively, the tier could
run ONE [864, 144] matmul with exact int16 fixed-point filters — the same
slot count as the bf16 tier, no combine, half the gt bytes.

MEASURED RESULT (2026-08-18, v5e via axon remote compile):
    s8  x s8  -> s32   SUPPORTED, bit-exact vs numpy
    s16 x s8  -> s32   UNSUPPORTED (tpu_compile_helper exit 1)
    s16 x s16 -> s32   UNSUPPORTED
    s32 x s8  -> s32   UNSUPPORTED
i.e. the MXU's only integer mode reachable from Pallas is s8xs8 — the
hi/lo int8 pair (full_kernel.py i8 path) is already the optimal
fixed-point formulation; the single-slot s16 variant is CLOSED.

This tool re-checks correctness only. Rate A/Bs belong in
tools/kbench_full.py (in-kernel rep loops here hit unrelated Mosaic
lowering failures and dispatch overhead swamps single dots).

Usage: python tools/probe_s16.py    (TPU env; see tools/post_outage.sh)
"""

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
from jax import lax
from jax.experimental import pallas as pl

M, K, N = 864, 144, 512


def _kernel(lt, rt, o_ref):
    o_ref[...] = lax.dot_general(
        lt[...], rt[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def run(name, ldt, rdt, lmax):
    from raisr_tpu.ops.jit_utils import tpu_jit

    rng = np.random.default_rng(0)
    lv = rng.integers(-lmax, lmax, (M, K))
    rv = rng.integers(-120, 120, (K, N))
    fn = tpu_jit(pl.pallas_call(
        _kernel, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32)
    ))
    try:
        out = np.asarray(fn(jnp.asarray(lv, ldt), jnp.asarray(rv, rdt)))
    except Exception as e:  # lowering/compile failure = unsupported
        print(f"{name}: UNSUPPORTED ({type(e).__name__}: {str(e)[:120]})")
        return
    ref = lv.astype(np.int64) @ rv.astype(np.int64)
    print(f"{name}: SUPPORTED, exact={np.array_equal(out.astype(np.int64), ref)}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    run("s8xs8->s32  ", jnp.int8, jnp.int8, 120)
    run("s16xs8->s32 ", jnp.int16, jnp.int8, 30000)
    run("s16xs16->s32", jnp.int16, jnp.int16, 30000)
    run("s32xs8->s32 ", jnp.int32, jnp.int8, 30000)
