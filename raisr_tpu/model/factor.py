"""Low-rank filter-bank factorization for the fused kernel's gather path.

The shipped first-pass banks (e.g. filters_2x/filters_highres filterbin_2_8,
cf. reference Raisr.cpp:1492 ReadTrainedData consumers) are EXACTLY
low-rank: the [864, 121] tap table has numerical rank <= 64
(sigma_64 / sigma_0 ~ 1e-16 measured on filters_highres), so F = C @ B with
C [864, 64] and B [64, 121] reconstructs to the f32 noise floor. The fused
kernel then replaces its [864, K] filter matmul + 216-row select with a
[4*64, K] basis matmul (shared across the select) plus a [128, 216]
onehot-gather matmul per pixel phase — about half the MXU work at the same
16-bit (bf16 hi/lo) quantization grade. Measured reconstruction error after
quantizing both factors hi/lo: max 3.9e-5 vs 3.0e-5 for direct hi/lo F
(|F|max 7.2). Second-pass banks are full-rank (rank-64 relative residual
~1e-2 on filters_highres) and stay on the direct path; `factor_filters`
returns None for them.
"""

from __future__ import annotations

import numpy as np

RANK = 64


def factor_filters(
    filters: np.ndarray,
    n_taps: int = 121,
    rank: int = RANK,
    rtol: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Factor a filter table as C @ B if it is low-rank, else return None.

    filters: [rows, >= n_taps]; only the first n_taps columns are factored
    (the loader pads tap tables to 128 lanes with zeros).
    Returns (C [rows, rank] f32, B [rank, n_taps] f32) when the relative
    Frobenius residual of the rank-`rank` truncation is <= rtol.
    """
    f = np.asarray(filters, np.float64)[:, :n_taps]
    u, s, vt = np.linalg.svd(f, full_matrices=False)
    total = float(np.sqrt((s**2).sum()))
    if total == 0.0:
        return None
    resid = float(np.sqrt((s[rank:] ** 2).sum()))
    if resid / total > rtol:
        return None
    c = u[:, :rank]
    b = s[:rank, None] * vt[:rank]
    return c.astype(np.float32), b.astype(np.float32)
