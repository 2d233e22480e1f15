"""jit helpers.

The fused pallas kernel's unrolled loop gets software-pipelined by Mosaic,
which pins one [224, N] f32 MXU result per unrolled iteration; the XLA
scoped-VMEM default (16 MB) then rejects 2K+ frames. Physical VMEM is much
larger — raising xla_tpu_scoped_vmem_limit_kib on the *top-level* jit is the
supported escape hatch (the option must be set on whichever jit ultimately
compiles the pallas call).
"""

from __future__ import annotations

import functools

import jax

SCOPED_VMEM_KIB = 124 * 1024

def compiler_options() -> dict | None:
    """Compile options for top-level jits wrapping the fused kernel."""
    if jax.default_backend() == "cpu":
        return None  # CPU XLA rejects TPU-only options
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}


def tpu_jit(fn=None, **jit_kwargs):
    """jax.jit with the TPU scoped-VMEM compile option applied.

    The backend query (and hence jax.jit construction) is deferred to the
    first call: tpu_jit decorates module-level functions, and resolving the
    backend at import time would initialize JAX's platform before the host
    application (embedded interpreters, tests) can force one."""
    if fn is None:
        return functools.partial(tpu_jit, **jit_kwargs)

    cache: dict[str, object] = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        # Under an outer jit trace, inline instead of nesting: JAX rejects
        # compiler_options on nested jits, and the outer jit compiles the
        # whole thing anyway (callers wanting the scoped-VMEM option on
        # large shapes must call at top level, as the engine does).
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            return fn(*args, **kwargs)
        jitted = cache.get("jit")
        if jitted is None:
            kw = dict(jit_kwargs)
            opts = compiler_options()
            if opts is not None:
                kw.setdefault("compiler_options", opts)
            jitted = jax.jit(fn, **kw)
            cache["jit"] = jitted
        return jitted(*args, **kwargs)

    return wrapper
