"""RAISR filter training — a capability the reference does NOT ship.

The reference repo contains only pretrained banks; its filternotes.txt
describes the method (hashed least-squares per bucket: RAISR, arXiv:1606.01299
— cheap-upscaled LR patches regressed onto HR pixels per (bucket, phase)).
This module trains banks TPU-natively:

  - per (bucket, pixelType): accumulate the normal equations
        Q[b] += A^T A,   V[b] += A^T y
    over (cheap-upscaled LR, HR) pairs, where A rows are 11x11 patches of
    the cheap upscale whose center hashes to bucket b,
  - the per-pixel scatter is a one-hot MXU contraction (no host gathers),
  - data parallelism: each device accumulates its shard of image pairs,
    Q/V are combined with jax.lax.psum over the mesh — this is the
    framework's distributed *training step*,
  - solve (Q + lam*I) w = V batched over all 864 buckets, emit a FilterBank
    compatible with the inference engine and the reference's on-disk format
    (see train.export).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from raisr_tpu.config import RaisrConfig
from raisr_tpu.model.gaussian import gaussian_weights
from raisr_tpu.model.loader import FilterBank, RaisrModel
from raisr_tpu.ops import hashing
from raisr_tpu.ops.resize import cheap_upscale


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    ratio: float = 2.0
    bits: int = 8
    qangle: int = 24
    qstrength: int = 3
    qcoherence: int = 3
    patch_size: int = 11
    # strength/coherence bin edges; defaults match the shipped 2x banks
    qstr: tuple[float, ...] = (0.001269, 0.022169)
    qcoh: tuple[float, ...] = (0.192916, 0.405942)
    lam: float = 0.01  # Tikhonov regularization for the normal equations
    chunk: int = 2048  # pixels per one-hot contraction chunk
    # accumulate each pair under all 8 dihedral transforms (rot90/flip of
    # both images), the standard RAISR augmentation: buckets for rotated
    # content are filled from unrotated sources, roughly octupling the
    # effective training set (RAISR paper sec. IV-C)
    augment_symmetry: bool = False
    # cheap-upscale resampler the bank is trained against — must match the
    # inference RaisrConfig.resize_mode (filters learn the residual of THIS
    # upscaler)
    resize_mode: str = "bilinear"

    @property
    def pixel_types(self) -> int:
        return int(self.ratio) * int(self.ratio)

    # full-range reject bounds for the CT-aware refinement's provisional
    # inference (training content is full-range; the weight map is barely
    # sensitive to these — they only gate the rare out-of-range reject)
    @property
    def min_val(self) -> int:
        return 0

    @property
    def max_val(self) -> int:
        return (1 << self.bits) - 1

    @property
    def num_buckets(self) -> int:
        return self.qangle * self.qstrength * self.qcoherence

    @property
    def num_filters(self) -> int:
        return self.num_buckets * self.pixel_types


def _patches_and_labels(cheap: jnp.ndarray, hr: jnp.ndarray, cfg: TrainConfig):
    """im2col over the interior + per-pixel filter index + HR labels."""
    m = cfg.patch_size // 2
    lm = m + 1
    h, w = cheap.shape
    weights = gaussian_weights(cfg.patch_size, cfg.bits)

    gx, gy = hashing.gradients(cheap)
    a, b, d = hashing.structure_tensor(gx, gy, jnp.asarray(weights))
    buckets = hashing.hash_buckets(
        a, b, d,
        jnp.asarray(cfg.qstr, jnp.float32), jnp.asarray(cfg.qcoh, jnp.float32),
        cfg.qangle, cfg.qstrength, cfg.qcoherence,
    )
    ptype = hashing.pixel_types(h, w, int(cfg.ratio), m, cfg.pixel_types > 1)
    idx = buckets * cfg.pixel_types + ptype

    # interior pixels only (matches the inference processed zone)
    core = (slice(lm, h - lm), slice(lm, w - lm))
    n_taps = cfg.patch_size * cfg.patch_size
    cols = []
    for i in range(cfg.patch_size):
        for j in range(cfg.patch_size):
            cols.append(
                lax.dynamic_slice(
                    cheap, (lm - m + i, lm - m + j), (h - 2 * lm, w - 2 * lm)
                ).reshape(-1)
            )
    patches = jnp.stack(cols, axis=1)  # [N, 121]
    labels = hr[core].reshape(-1)
    return patches, idx[core].reshape(-1), labels


def _accumulate_chunked(q, v, patches, labels, idx, nf: int, c: int):
    """Chunked one-hot MXU scatter of per-row normal-equation contributions:
    Q[b] += sum_{n: idx_n=b} p_n p_n^T, V[b] += sum y_n p_n."""
    n = patches.shape[0]
    n_chunks = -(-n // c)
    pad = n_chunks * c - n
    patches = jnp.pad(patches, ((0, pad), (0, 0)))
    labels = jnp.pad(labels, (0, pad))
    idx = jnp.pad(idx, (0, pad), constant_values=nf)  # pad rows -> no bucket

    def body(k, qv):
        q, v = qv
        p = lax.dynamic_slice(patches, (k * c, 0), (c, patches.shape[1]))
        y = lax.dynamic_slice(labels, (k * c,), (c,))
        ix = lax.dynamic_slice(idx, (k * c,), (c,))
        onehot = (ix[:, None] == jnp.arange(nf)[None, :]).astype(jnp.float32)
        # V[b] += sum onehot[n,b] * y_n * p_n : [nf, c] @ [c, 121]
        v = v + jnp.matmul(
            onehot.T, p * y[:, None], precision=lax.Precision.HIGHEST
        )
        # Q[b] += p^T diag(onehot[:, b]) p — contracted as
        # (p outer p) [c,121,121] then [nf, c] @ [c, 121*121] on the MXU
        outer = (p[:, :, None] * p[:, None, :]).reshape(c, -1)
        q = q + jnp.matmul(
            onehot.T, outer, precision=lax.Precision.HIGHEST
        ).reshape(q.shape)
        return q, v

    return lax.fori_loop(0, n_chunks, body, (q, v))


@functools.partial(jax.jit, static_argnames=("cfg",))
def accumulate_pair(
    q: jnp.ndarray,  # [num_filters, 121, 121] f32
    v: jnp.ndarray,  # [num_filters, 121] f32
    cheap: jnp.ndarray,  # [H, W] integer-valued f32 (cheap-upscaled LR)
    hr: jnp.ndarray,  # [H, W] integer-valued f32 (ground truth)
    cfg: TrainConfig,
):
    """Add one image pair's normal-equation contributions to (Q, V)."""
    patches, idx, labels = _patches_and_labels(cheap, hr, cfg)
    return _accumulate_chunked(q, v, patches, labels, idx, cfg.num_filters,
                               cfg.chunk)


@functools.partial(jax.jit, static_argnames=("cfg", "blending"))
def accumulate_pair_ct(
    q: jnp.ndarray,
    v: jnp.ndarray,
    cheap: jnp.ndarray,  # [H, W] integer-valued f32 (cheap-upscaled LR)
    hr: jnp.ndarray,  # [H, W] integer-valued f32 (ground truth)
    filters: jnp.ndarray,  # [num_filters, >=121] provisional bank (pass 1 of
    #                        the fixed point; defines the blend weights)
    cfg: TrainConfig,
    blending: int,  # 1 = Randomness, 2 = CountOfBitsChanged
):
    """CT-blend-aware weighted accumulation.

    At inference the filter only reaches the output through the census
    blend: out = s*filtered + (1-s)*cheap, with s = w for Randomness
    (Raisr.cpp:1222-1232) and s = 1-w for CountOfBitsChanged
    (Raisr.cpp:712-748). Plain RAISR least squares ignores s and spends
    filter capacity on pixels the blend then discards. Minimizing the true
    blended error sum (y - (1-s) c - s p^T f)^2 instead is a weighted least
    squares: rows scale by s, labels become y - (1-s) c — so Q[b] += s^2 p
    p^T and V[b] += s (y - (1-s) c) p, which _accumulate_chunked computes
    verbatim from (s*p, y-tilde).

    For CountOfBitsChanged s depends on the filtered image itself (census
    Hamming distance), so callers pass a provisional bank trained plain and
    this runs one fixed-point refinement — the reject + census here mirror
    ops/pipeline._finish_pass exactly.
    """
    from raisr_tpu.ops import census

    patches, idx, labels = _patches_and_labels(cheap, hr, cfg)
    m = cfg.patch_size // 2
    lm = m + 1
    h, w = cheap.shape
    core = (slice(lm, h - lm), slice(lm, w - lm))
    c_vals = patches[:, m * cfg.patch_size + m]  # cheap at the output pixel

    # provisional filtered plane (borders stay cheap, as at inference) with
    # the out-of-range reject of _finish_pass (exclusive compare)
    raw = jnp.sum(patches * filters[idx, : patches.shape[1]], axis=1)
    keep = (raw > float(cfg.min_val)) & (raw < float(cfg.max_val))
    raisr_vals = jnp.where(keep, raw, c_vals)
    plane = cheap.at[core].set(raisr_vals.reshape(h - 2 * lm, w - 2 * lm))

    if blending == 1:
        s = census.randomness_weight(cheap)
    else:
        s = 1.0 - census.cobc_weight(cheap, plane)
    s_core = s[core].reshape(-1)

    return _accumulate_chunked(
        q, v,
        patches * s_core[:, None],
        labels - (1.0 - s_core) * c_vals,
        idx, cfg.num_filters, cfg.chunk,
    )


def init_accumulators(cfg: TrainConfig):
    n_taps = cfg.patch_size * cfg.patch_size
    q = jnp.zeros((cfg.num_filters, n_taps, n_taps), jnp.float32)
    v = jnp.zeros((cfg.num_filters, n_taps), jnp.float32)
    return q, v


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_filters(q: jnp.ndarray, v: jnp.ndarray, cfg: TrainConfig) -> jnp.ndarray:
    """Regularized normal-equation solve -> [num_filters, 128] padded.

    Per-bucket *relative* Tikhonov regularization toward the identity filter:
        (Q + lam_b I) w = V + lam_b e_center,  lam_b = lam * trace(Q_b)/taps.
    This keeps the batched f32 solve well-conditioned (cond <= taps/lam) and
    makes under-sampled buckets fall back smoothly to pass-through — empty
    buckets become exactly the interpolation-identity filter."""
    n_taps = q.shape[-1]
    eye = jnp.eye(n_taps, dtype=jnp.float32)
    identity = jnp.zeros((n_taps,), jnp.float32).at[n_taps // 2].set(1.0)

    trace = jnp.einsum("bii->b", q)
    lam_b = cfg.lam * trace / n_taps + 1e-8  # empty buckets: pure identity
    a = q + lam_b[:, None, None] * eye[None]
    rhs = v + lam_b[:, None] * identity[None, :]
    w = jnp.linalg.solve(a, rhs[..., None])[..., 0]

    aligned = 16 * ((n_taps + 15) // 16)
    return jnp.pad(w, ((0, 0), (0, aligned - n_taps)))


def _dihedral_transforms(lr, hr, enabled: bool):
    """Yield (lr, hr) under the dihedral group D4 (identity only if disabled).

    Transforming the image pairs themselves (instead of permuting buckets and
    filter taps) keeps the hash/accumulation path identical for every
    orientation."""
    lr = np.asarray(lr)
    hr = np.asarray(hr)
    if not enabled:
        yield lr, hr
        return
    for flip in (False, True):
        lr_f = lr[:, ::-1] if flip else lr
        hr_f = hr[:, ::-1] if flip else hr
        for k in range(4):
            yield np.rot90(lr_f, k), np.rot90(hr_f, k)


def train_filterbank(
    pairs: Iterable[tuple[np.ndarray, np.ndarray]],
    cfg: TrainConfig,
) -> FilterBank:
    """Train from (lr, hr) uint pairs (single device)."""
    q, v = init_accumulators(cfg)
    for lr, hr in pairs:
        for lr_t, hr_t in _dihedral_transforms(lr, hr, cfg.augment_symmetry):
            hr_t = jnp.asarray(hr_t, jnp.float32)
            out_h, out_w = hr_t.shape
            cheap = cheap_upscale(
                jnp.asarray(lr_t, jnp.float32), out_h, out_w, cfg.bits,
                mode=cfg.resize_mode,
            )
            q, v = accumulate_pair(q, v, cheap, hr_t, cfg)
    filters = solve_filters(q, v, cfg)
    return FilterBank(
        filters=np.asarray(filters),
        qstr=np.asarray(cfg.qstr, np.float32),
        qcoh=np.asarray(cfg.qcoh, np.float32),
        pixel_types=cfg.pixel_types,
        taps=cfg.patch_size * cfg.patch_size,
        source_dtype="fp32",
    )


def train_filterbank_ct(
    pairs_factory,  # () -> Iterable[(lr, hr)]; called twice (two sweeps)
    cfg: TrainConfig,
    blending: int = 2,
) -> FilterBank:
    """Train a CT-blend-aware bank (see accumulate_pair_ct).

    Sweep 1 trains a plain bank (the fixed-point seed that defines the
    CountOfBitsChanged weights); sweep 2 re-accumulates the normal equations
    weighted by each pixel's effective blend scale and re-solves. For
    Randomness blending the weights don't depend on the bank, but the
    two-sweep shape is kept so both modes share one code path."""
    bank0 = train_filterbank(pairs_factory(), cfg)
    f0 = jnp.asarray(bank0.filters)
    q, v = init_accumulators(cfg)
    for lr, hr in pairs_factory():
        for lr_t, hr_t in _dihedral_transforms(lr, hr, cfg.augment_symmetry):
            hr_t = jnp.asarray(hr_t, jnp.float32)
            out_h, out_w = hr_t.shape
            cheap = cheap_upscale(
                jnp.asarray(lr_t, jnp.float32), out_h, out_w, cfg.bits,
                mode=cfg.resize_mode,
            )
            q, v = accumulate_pair_ct(q, v, cheap, hr_t, f0, cfg, blending)
    filters = solve_filters(q, v, cfg)
    return FilterBank(
        filters=np.asarray(filters),
        qstr=np.asarray(cfg.qstr, np.float32),
        qcoh=np.asarray(cfg.qcoh, np.float32),
        pixel_types=cfg.pixel_types,
        taps=cfg.patch_size * cfg.patch_size,
        source_dtype="fp32",
    )


def train_filterbank_pass2(
    pairs: Iterable[tuple[np.ndarray, np.ndarray]],
    cfg: TrainConfig,
    bank1: FilterBank,
) -> FilterBank:
    """Train a SECOND-pass (sharpening) bank on top of a trained pass-1
    bank — the role of the reference's shipped `filterbin_*_2` files.

    Two-pass mode 1 semantics (reference Raisr.cpp second-pass flow): the
    pass-2 input is the first pass's full inference output — filtered,
    census-blended, and integer-quantized — at HR scale; the target is the
    original HR. Training on the true quantized intermediate (not the raw
    filter output) makes the pass-2 normal equations see exactly the
    distribution pass 2 sees at inference."""
    from raisr_tpu.config import RaisrConfig
    from raisr_tpu.model.loader import RaisrModel
    from raisr_tpu.ops.pipeline import pass_statics, process_plane_y

    model1 = RaisrModel(
        qangle=cfg.qangle, qstrength=cfg.qstrength,
        qcoherence=cfg.qcoherence, patch_size=cfg.patch_size,
        banks=(bank1,),
    )
    rcfg = RaisrConfig(bits=cfg.bits, ratio=cfg.ratio, passes=1,
                       resize_mode=cfg.resize_mode)
    statics = pass_statics(rcfg, model1, "taps")
    filters = (jnp.asarray(bank1.filters),)
    qstr = (jnp.asarray(bank1.qstr),)
    qcoh = (jnp.asarray(bank1.qcoh),)

    q, v = init_accumulators(cfg)
    for lr, hr in pairs:
        for lr_t, hr_t in _dihedral_transforms(lr, hr, cfg.augment_symmetry):
            hr_t = jnp.asarray(hr_t, jnp.float32)
            out_h, out_w = hr_t.shape
            pass1 = process_plane_y(
                jnp.asarray(lr_t, jnp.float32), filters, qstr, qcoh,
                statics, 1, 1, out_h, out_w,
            )
            q, v = accumulate_pair(q, v, pass1, hr_t, cfg)
    filters2 = solve_filters(q, v, cfg)
    return FilterBank(
        filters=np.asarray(filters2),
        qstr=np.asarray(cfg.qstr, np.float32),
        qcoh=np.asarray(cfg.qcoh, np.float32),
        pixel_types=cfg.pixel_types,
        taps=cfg.patch_size * cfg.patch_size,
        source_dtype="fp32",
    )


def train_step_sharded(
    lr_batch: jnp.ndarray,  # [N, h, w] — N sharded over the mesh
    hr_batch: jnp.ndarray,  # [N, H, W]
    cfg: TrainConfig,
    mesh,
    axis: str = "data",
    ct_filters: Optional[jnp.ndarray] = None,  # replicated seed bank -> the
    #   CT-blend-aware weighted step (accumulate_pair_ct); None = plain LS
    blending: int = 2,
):
    """One distributed training step: every device hashes + accumulates its
    shard of image pairs; Q/V are reduced with psum over ICI. Returns the
    solved filter bank (replicated). With ct_filters, this is the sharded
    second sweep of train_filterbank_ct (run a plain step first, feed its
    bank back in)."""
    from jax.sharding import PartitionSpec as P

    out_h, out_w = hr_batch.shape[1], hr_batch.shape[2]

    def per_device(lr_s, hr_s, *f0):
        q, v = init_accumulators(cfg)

        def body(i, qv):
            q, v = qv
            cheap = cheap_upscale(lr_s[i].astype(jnp.float32), out_h, out_w,
                                  cfg.bits, mode=cfg.resize_mode)
            hr_i = hr_s[i].astype(jnp.float32)
            if f0:
                return accumulate_pair_ct(q, v, cheap, hr_i, f0[0], cfg,
                                          blending)
            return accumulate_pair(q, v, cheap, hr_i, cfg)

        q, v = lax.fori_loop(0, lr_s.shape[0], body, (q, v))
        q = lax.psum(q, axis)
        v = lax.psum(v, axis)
        return solve_filters(q, v, cfg)

    extra = () if ct_filters is None else (ct_filters,)
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None))
        + ((P(),) if extra else ()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(lr_batch, hr_batch, *extra)
