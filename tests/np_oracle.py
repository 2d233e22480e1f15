"""Independent NumPy oracle for the RAISR pipeline.

Naive-loop port of the reference's *scalar* semantics (with the AVX-512
tie-breaking for strength/coherence bins), used only by tests on tiny images.
Deliberately written with explicit loops and no shared code with raisr_tpu.
"""

import numpy as np

PI = np.float32(np.pi)


def cheap_upscale(img, out_h, out_w, bits):
    in_h, in_w = img.shape
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        sr = min(max((r + 0.5) * in_h / out_h - 0.5, 0.0), in_h - 1)
        r0 = int(np.floor(sr))
        r1 = min(r0 + 1, in_h - 1)
        fr = sr - r0
        for c in range(out_w):
            sc = min(max((c + 0.5) * in_w / out_w - 0.5, 0.0), in_w - 1)
            c0 = int(np.floor(sc))
            c1 = min(c0 + 1, in_w - 1)
            fc = sc - c0
            v = (
                img[r0, c0] * (1 - fr) * (1 - fc)
                + img[r0, c1] * (1 - fr) * fc
                + img[r1, c0] * fr * (1 - fc)
                + img[r1, c1] * fr * fc
            )
            out[r, c] = min(max(np.floor(v + 0.5), 0), (1 << bits) - 1)
    return out.astype(np.float32)


def atan2_approx(y, x):
    abs_y = abs(y) + 1e-10
    if x < 0.0:
        r = (x + abs_y) / (abs_y - x)
        angle = 3.0 * np.pi / 4.0
    else:
        r = (x - abs_y) / (x + abs_y)
        angle = np.pi / 4.0
    angle += (0.1963 * r * r - 0.9817) * r
    return -angle if y < 0.0 else angle


def hash_bucket(a, b, d, qstr, qcoh, qangle=24, qstrength=3, qcoherence=3):
    t = a + d
    det = a * d - b * b
    sqr = np.sqrt(max(t * t / 4.0 - det, 0.0))
    l1 = t / 2.0 + sqr
    l2 = max(t / 2.0 - sqr, 0.0)
    x = (l1 - d) if b != 0.0 else 1.0
    angle = atan2_approx(b, x)
    if angle < 0:
        angle += np.pi
    coh = (np.sqrt(l1) - np.sqrt(l2)) / (np.sqrt(l1) + np.sqrt(l2) + 1e-17)
    angle_idx = int(np.floor(angle * (qangle / np.pi)))
    angle_idx = min(max(angle_idx, 0), qangle - 1)
    s_idx = sum(int(e <= l1) for e in qstr)  # AVX-512 tie semantics
    c_idx = sum(int(e <= coh) for e in qcoh)
    return angle_idx * qstrength * qcoherence + s_idx * qcoherence + c_idx


def census_count(img, r, c):
    count = 0
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            if i == 0 and j == 0:
                continue
            if img[r + i, c + j] < img[r, c]:
                count += 1
    return count


def hamming(lr, hr, r, c):
    dist = 0
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            if i == 0 and j == 0:
                continue
            dist += abs(
                int(lr[r + i, c + j] < lr[r, c]) - int(hr[r + i, c + j] < hr[r, c])
            )
    return dist


def processed_col_end(w, exact_edges=True):
    if not exact_edges:
        return w - 6
    usable = w - 12
    if usable < 16:
        return 6
    return 6 + 8 * (usable // 8)


def raisr_pass(
    cheap,
    filters,
    qstr,
    qcoh,
    weights,
    pixel_types,
    ratio,
    min_val,
    max_val,
    blending,
    exact_edges=True,
):
    """One pass; cheap is an integer-valued float array [H, W]."""
    h, w = cheap.shape
    cheap = cheap.astype(np.float64)
    gx = np.zeros_like(cheap)
    gy = np.zeros_like(cheap)
    gx[1:-1, :] = cheap[2:, :] - cheap[:-2, :]
    gy[:, 1:-1] = cheap[:, 2:] - cheap[:, :-2]

    col_end = processed_col_end(w, exact_edges)
    hr = cheap.copy()
    raisr_raw = np.full((h, w), np.nan)
    for r in range(6, h - 6):
        for c in range(6, col_end):
            win_gx = gx[r - 5 : r + 6, c - 5 : c + 6]
            win_gy = gy[r - 5 : r + 6, c - 5 : c + 6]
            a = float((weights * win_gx * win_gx).sum())
            b = float((weights * win_gx * win_gy).sum())
            d = float((weights * win_gy * win_gy).sum())
            bucket = hash_bucket(a, b, d, qstr, qcoh)
            if pixel_types > 1:
                pt = ((r - 5) % ratio) * ratio + ((c - 5) % ratio)
            else:
                pt = 0
            patch = cheap[r - 5 : r + 6, c - 5 : c + 6].ravel()
            val = float(patch @ filters[bucket * pixel_types + pt, :121])
            raisr_raw[r, c] = val
            if min_val < val < max_val:
                hr[r, c] = val
            # else hr keeps the cheap pixel

    out = cheap.copy()
    if blending == 1:  # Randomness
        for r in range(6, h - 6):
            for c in range(6, col_end):
                weight = census_count(cheap, r, c) / 8.0
                val = weight * hr[r, c] + (1 - weight) * cheap[r, c]
                out[r, c] = min(max(np.floor(val + 0.5), min_val), max_val)
    else:  # CountOfBitsChanged
        for r in range(1, h - 1):
            for c in range(1, w - 1):
                weight = hamming(cheap, hr, r, c) / 8.0
                val = weight * cheap[r, c] + (1 - weight) * hr[r, c]
                out[r, c] = min(max(np.floor(val + 0.5), min_val), max_val)
    return out.astype(np.float32)
