"""Independent NumPy golden implementations of the reference kernels.

Written directly from the algorithm definitions in SURVEY.md / the CUDA
sources' behavior (scalar loops, no vectorization tricks shared with the JAX
code) so that agreement is meaningful.
"""
from __future__ import annotations

import numpy as np


def census(img: np.ndarray, offsets, n_words: int) -> np.ndarray:
    H, W = img.shape
    out = np.zeros((H, W, n_words), np.uint32)
    for y in range(H):
        for x in range(W):
            p = img[y, x]
            for k, (r, c) in enumerate(offsets):
                qy = min(max(y + r, 0), H - 1)
                qx = min(max(x + c, 0), W - 1)
                if img[qy, qx] < p:
                    out[y, x, k // 32] |= np.uint32(1 << (k % 32))
    return out


def census_offsets(window: str):
    if window == "9x7":
        return [(r, c) for r in range(-3, 4) for c in range(-4, 5)], 2, 64
    if window == "11x11":
        return [(r, c) for r in range(-5, 6) for c in range(-5, 6)], 4, 128
    if window == "16x16":
        return [(r, c) for r in range(-8, 8) for c in range(-4, 4)], 4, 256
    raise ValueError(window)


def hamming(a, b):
    x = np.bitwise_xor(a, b)
    return sum(bin(int(w)).count("1") for w in x)


def census_cost_volume(left, right, max_disp, sd, capacity_bits):
    H, W, K = left.shape
    vol = np.zeros((max_disp, H, W), np.float32)
    for d in range(max_disp):
        for y in range(H):
            for x in range(W):
                xd = x + sd * d
                if 0 <= xd < W:
                    vol[d, y, x] = hamming(left[y, x], right[y, xd]) / capacity_bits
                else:
                    vol[d, y, x] = 0.5
    return vol


def cost_vol_minimum(vol, max_disp_val):
    D, H, W = vol.shape
    disp = np.zeros((H, W), np.int32)
    for y in range(H):
        for x in range(W):
            maxd = min(max_disp_val, x + 1)
            bestc = vol[0, y, x]
            bestd = 0
            for d in range(1, maxd):
                if vol[d, y, x] < bestc:
                    bestc = vol[d, y, x]
                    bestd = d
            disp[y, x] = bestd
    return disp


def cost_vol_minimum_subpix(vol, sd=-1):
    D, H, W = vol.shape
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            bestc = 1e10
            bestd = 0
            for d in range(D):
                xr = x + sd * d
                if 0 <= xr < W and vol[d, y, x] < bestc:
                    bestc = vol[d, y, x]
                    bestd = d
            out[y, x] = bestd
            bestxr = x + sd * bestd
            if 0 < bestxr < W - 1:
                dl, dr = bestd - 1, bestd + 1
                sl = vol[max(dl, 0), y, x]
                sr = vol[min(dr, D - 1), y, x]
                sub = bestd - (sr - sl) / (2 * (sr - 2 * bestc + sl))
                if dl < sub < dr:
                    out[y, x] = sub
    return out


def cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd=-1):
    D, H, W = vol.shape
    out = np.zeros((H, W), np.float32)
    inv2t = 1.0 / (2.0 * theta)
    for y in range(H):
        for x in range(W):
            lastd = last_disp[y, x]
            bestc = inv2t * lastd * lastd + lam * vol[0, y, x]
            bestd = 0
            for d in range(1, D):
                xr = x + sd * d
                if 0 <= xr < W:
                    c = inv2t * (lastd - d) ** 2 + lam * vol[d, y, x]
                    if c < bestc:
                        bestc = c
                        bestd = d
            out[y, x] = bestd
            bestxr = x + sd * bestd
            if 0 < bestxr < W - 1:
                dl, dr = bestd - 1, bestd + 1
                sl = inv2t * (lastd - dl) ** 2 + lam * vol[max(dl, 0), y, x]
                sr = inv2t * (lastd - dr) ** 2 + lam * vol[min(dr, D - 1), y, x]
                sub = bestd - (sr - sl) / (2 * (sr - 2 * bestc + sl))
                if dl < sub < dr:
                    out[y, x] = sub
    return out


def left_right_check(disp_l, disp_r, sd, max_diff):
    H, W = disp_l.shape
    out = disp_l.copy()
    for y in range(H):
        for x in range(W):
            dl = disp_l[y, x]
            xr = x + sd * dl
            xr_i = int(xr)
            if 0 <= xr < W:
                dr = disp_r[y, xr_i]
                if not np.isfinite(dr) or abs(dl - dr) > max_diff:
                    out[y, x] = np.nan
            else:
                out[y, x] = np.nan
    return out


def median_reject_invalid(img, max_bad, rad):
    H, W = img.shape
    k = (2 * rad + 1) ** 2
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            vals = []
            bad = 0
            for dx in range(-rad, rad + 1):
                for dy in range(-rad, rad + 1):
                    q = img[min(max(y + dy, 0), H - 1), min(max(x + dx, 0), W - 1)]
                    vals.append(q)
                    if not np.isfinite(q):
                        bad += 1
            if bad < max_bad and bad < k:
                svals = np.sort(np.where(np.isfinite(vals), vals, np.inf))
                out[y, x] = svals[(k + bad) // 2]
            else:
                out[y, x] = np.nan
    return out


def sgm_aggregate(vol, img, P1, P2, directions):
    """Standard independent-path SGM with the reference's recurrence and
    per-x disparity clipping. directions: list of (dx, dy), straight or
    diagonal."""
    D, H, W = vol.shape
    out = np.zeros((D, H, W), np.float32)
    MAX = 1e30
    for dx, dy in directions:
        lr = np.zeros((D, H, W), np.float32)
        # path starts: pixels with no predecessor in (dx, dy)
        starts = [
            (x, y)
            for y in range(H)
            for x in range(W)
            if not (0 <= x - dx < W and 0 <= y - dy < H)
        ]
        pathlen = H * W  # walk until out of bounds
        for sx, sy in starts:
            x, y = sx, sy
            maxd = min(D, x + 1)
            last = np.full(D, MAX, np.float32)
            for d in range(maxd):
                lr[d, y, x] = vol[d, y, x]
                last[d] = vol[d, y, x]
            last_best = 0.0
            last_c = img[y, x]
            last_maxd = maxd
            x += dx
            y += dy
            for _ in range(1, pathlen):
                if not (0 <= x < W and 0 <= y < H):
                    break
                c = img[y, x]
                p2 = P2 / (1.0 + abs(last_c - c))
                maxd = min(D, x + 1)
                cur = np.full(D, MAX, np.float32)
                best = MAX
                for d in range(maxd):
                    cm = last_best + p2
                    if d < last_maxd:
                        cm = min(cm, last[d])
                    if d > 0:
                        cm = min(cm, last[d - 1] + P1)
                    if d + 1 < last_maxd:
                        cm = min(cm, last[d + 1] + P1)
                    cr = cm + vol[d, y, x] - last_best
                    cur[d] = cr
                    lr[d, y, x] = cr
                    best = min(best, cr)
                last = cur
                last_best = best
                last_c = c
                last_maxd = maxd
                x += dx
                y += dy
        out += lr
    return out


def bilateral(img, gs, gr, size, minval=None):
    H, W = img.shape
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            p = img[y, x]
            s = 0.0
            sw = 0.0
            for r in range(-size, size + 1):
                for c in range(-size, size + 1):
                    q = img[min(max(y + r, 0), H - 1), min(max(x + c, 0), W - 1)]
                    if minval is not None and not (q >= minval):
                        continue
                    w = np.exp(-(r * r + c * c) / (2 * gs * gs)) * np.exp(
                        -((p - q) ** 2) / (2 * gr * gr)
                    )
                    s += w * q
                    sw += w
            if minval is not None and not (img[y, x] >= minval):
                # reference skips the window entirely -> 0/0 = NaN
                # (cu_bilateral.cu:71-90)
                out[y, x] = np.nan
            elif sw == 0:
                out[y, x] = np.nan
            else:
                out[y, x] = s / sw
    return out


def bilateral_cross3(img, guide, gs, gr, gc, size):
    """3-weight guided bilateral (cu_bilateral.cu:110-142): spatial gs,
    self range gr on the filtered values p-q, colour range gc on the
    guide pc-qc."""
    H, W = img.shape
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            p = img[y, x]
            pc = guide[y, x]
            s = 0.0
            sw = 0.0
            for r in range(-size, size + 1):
                for c in range(-size, size + 1):
                    yy = min(max(y + r, 0), H - 1)
                    xx = min(max(x + c, 0), W - 1)
                    q = img[yy, xx]
                    qc = guide[yy, xx]
                    w = (
                        np.exp(-(r * r + c * c) / (2 * gs * gs))
                        * np.exp(-((p - q) ** 2) / (2 * gr * gr))
                        * np.exp(-((pc - qc) ** 2) / (2 * gc * gc))
                    )
                    s += w * q
                    sw += w
            out[y, x] = p if sw == 0 else s / sw
    return out


def box_filter(img, rad):
    H, W = img.shape
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            y0, y1 = max(y - rad, 0), min(y + rad, H - 1)
            x0, x1 = max(x - rad, 0), min(x + rad, W - 1)
            out[y, x] = img[y0 : y1 + 1, x0 : x1 + 1].sum()
    return out
