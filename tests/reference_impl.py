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


# ---------------------------------------------------------------------------
# Fusion / tracking / variational golden models (VERDICT r4 next #6):
# independent scalar loops written from the CUDA kernel definitions, NOT
# vectorised rewrites of the production JAX code.
# ---------------------------------------------------------------------------


def _bilinear(img, x, y):
    """Scalar clamped bilinear sample (Image.h GetBilinear:319-335)."""
    H, W = img.shape[:2]
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = np.float32(x - x0)
    fy = np.float32(y - y0)
    c = lambda xi, yi: img[min(max(yi, 0), H - 1), min(max(xi, 0), W - 1)]
    tl, tr = np.float32(c(x0, y0)), np.float32(c(x0 + 1, y0))
    bl, br = np.float32(c(x0, y0 + 1)), np.float32(c(x0 + 1, y0 + 1))
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    return top + (bot - top) * fy


def sdf_fuse(val, weight, lo, hi, depth, normals, T_cw, K, trunc_dist,
             max_w=1000.0, mincostheta=0.1):
    """Voxel-loop TSDF fuse (SdfFuse, cu_sdffusion.cu:16-61).

    val/weight (D, H, W) float; lo/hi world AABB corners; depth (Hi, Wi)
    metres; normals (Hi, Wi, 4) camera-frame (w=1 valid); T_cw (3, 4)
    world->camera; K = (fu, fv, u0, v0). Per voxel: project the centre,
    bilinear-sample depth+normal, sd = costheta * (md - vd), weight
    costheta/vd, skip if sd <= -trunc or grazing, weighted-average +=
    then LimitWeight (Sdf.h:25-32)."""
    D, H, W = val.shape
    fu, fv, u0, v0 = (float(k) for k in K)
    Hi, Wi = depth.shape
    out_v = val.copy()
    out_w = weight.copy()
    size = np.asarray(hi, np.float64) - np.asarray(lo, np.float64)
    for z in range(D):
        for y in range(H):
            for x in range(W):
                frac = np.array([x / (W - 1.0), y / (H - 1.0), z / (D - 1.0)])
                P_w = np.asarray(lo) + frac * size
                P_c = T_cw[:, :3] @ P_w + T_cw[:, 3]
                vd = P_c[2]
                u = u0 + fu * P_c[0] / vd
                v = v0 + fv * P_c[1] / vd
                if not (2 <= u < Wi - 2 and 2 <= v < Hi - 2):
                    continue
                md = _bilinear(depth, u, v)
                mdn = np.array([_bilinear(normals[..., k], u, v)
                                for k in range(3)])
                costheta = float(mdn @ P_c) / -np.linalg.norm(P_c)
                sd = costheta * (md - vd)
                w = costheta / vd
                if not np.isfinite(md) or not np.isfinite(w):
                    continue
                if sd <= -trunc_dist or costheta <= mincostheta:
                    continue
                sd = min(max(sd, -trunc_dist), trunc_dist)
                w_old = out_w[z, y, x]
                v_old = out_v[z, y, x] if w_old > 0 else 0.0
                w_tot = w_old + w
                if w_tot > 0:
                    out_v[z, y, x] = (w_old * v_old + w * sd) / w_tot
                out_w[z, y, x] = min(w_tot, max_w)
    return out_v, out_w


def _trilinear(vol, lo, hi, P_w):
    """Scalar clamped trilinear world-space sample
    (BoundedVolume::GetUnitsTrilinearClamped, BoundedVolume.h:93-98)."""
    D, H, W = vol.shape
    size = np.asarray(hi, np.float64) - np.asarray(lo, np.float64)
    pf = (np.asarray(P_w) - np.asarray(lo)) / size * np.array(
        [W - 1.0, H - 1.0, D - 1.0])
    ix, iy, iz = (int(np.floor(c)) for c in pf)
    gx, gy, gz = pf - np.array([ix, iy, iz])
    c = lambda dx, dy, dz: float(vol[min(max(iz + dz, 0), D - 1),
                                     min(max(iy + dy, 0), H - 1),
                                     min(max(ix + dx, 0), W - 1)])
    c00 = c(0, 0, 0) * (1 - gx) + c(1, 0, 0) * gx
    c01 = c(0, 1, 0) * (1 - gx) + c(1, 1, 0) * gx
    c10 = c(0, 0, 1) * (1 - gx) + c(1, 0, 1) * gx
    c11 = c(0, 1, 1) * (1 - gx) + c(1, 1, 1) * gx
    c0 = c00 * (1 - gy) + c01 * gy
    c1 = c10 * (1 - gy) + c11 * gy
    return c0 * (1 - gz) + c1 * gz


def raycast_sdf_depth(val, lo, hi, T_wc, K, w, h, near, far, subpix=True,
                      max_steps=512):
    """Per-pixel sphere-traced SDF raycast returning the depth image
    (RaycastSdf, cu_raycast.cu:34-113): Williams slab test, march with
    step max(sdf, voxelsize) (NaN sdf steps one voxel), linear
    zero-crossing interpolation when ``subpix``. NaN = miss."""
    D, H, W = val.shape
    fu, fv, u0, v0 = (float(k) for k in K)
    R = T_wc[:, :3]
    c_w = T_wc[:, 3]
    voxel = (np.asarray(hi, np.float64)[0] - np.asarray(lo)[0]) / (W - 1.0)
    depth = np.full((h, w), np.nan, np.float32)
    for py in range(h):
        for px in range(w):
            ray_c = np.array([(px - u0) / fu, (py - v0) / fv, 1.0])
            ray_w = R @ ray_c
            # slab test (cu_raycast.cu:44-51)
            with np.errstate(divide="ignore", invalid="ignore"):
                t0 = (np.asarray(lo) - c_w) / ray_w
                t1 = (np.asarray(hi) - c_w) / ray_w
            tmin = max(np.max(np.minimum(t0, t1)), near)
            tmax = min(np.min(np.maximum(t0, t1)), far)
            if not tmin < tmax:
                continue
            lam = tmin
            last_sdf = np.nan
            last_delta = 0.0
            for _ in range(max_steps):
                pos_w = c_w + lam * ray_w
                sdf = _trilinear(val, lo, hi, pos_w)
                if sdf <= 0:
                    if last_sdf > 0:  # surface crossing
                        if subpix:
                            depth[py, px] = lam + last_delta * sdf / (
                                last_sdf - sdf)
                        else:
                            depth[py, px] = lam
                    break
                delta = voxel if np.isnan(sdf) else max(sdf, voxel)
                lam += delta
                last_sdf = sdf
                last_delta = delta
                if lam >= tmax:
                    break
    return depth


def icp_point_plane(points_live, points_ref, normals_ref, KT_lr, T_rl, c,
                    K_live):
    """Per-pixel projective point-plane ICP system
    (PoseRefinementProjectiveIcpPointPlane, cu_model_refinement.cu:541-608).

    Project each reference model point into the live image (KT_lr), fetch
    the live depth at the nearest pixel and reconstruct the live point from
    the intrinsics, transform into the reference frame (T_rl), residual
    y = (P_l' - P_r) . N_r, Jacobian rows J_i = -(gen_i P_l') . N_r over
    the 6 SE3 generators (tx ty tz rx ry rz), weight (1/P_r.z) *
    Tukey(y, c). Returns (JTJ 6x6, JTy 6, sqErr, obs)."""
    H, W = points_ref.shape[:2]
    Hl, Wl = points_live.shape[:2]
    fu, fv, u0, v0 = (float(k) for k in K_live)
    JTJ = np.zeros((6, 6), np.float64)
    JTy = np.zeros(6, np.float64)
    sq = 0.0
    obs = 0
    for py in range(H):
        for px in range(W):
            Pr = points_ref[py, px, :3].astype(np.float64)
            Nr = normals_ref[py, px, :3].astype(np.float64)
            if normals_ref[py, px, 3] != 1.0 or not np.isfinite(Pr[2]):
                continue
            KPl = KT_lr[:, :3] @ Pr + KT_lr[:, 3]
            u = KPl[0] / KPl[2]
            v = KPl[1] / KPl[2]
            if not (3 <= u < Wl - 3 and 3 <= v < Hl - 3):
                continue
            ui = min(max(int(np.floor(u + 0.5)), 0), Wl - 1)
            vi = min(max(int(np.floor(v + 0.5)), 0), Hl - 1)
            z = points_live[vi, ui, 2]
            if not np.isfinite(z):
                continue
            Pl = np.array([(ui - u0) / fu * z, (vi - v0) / fv * z, z])
            Pl_r = T_rl[:, :3] @ Pl + T_rl[:, 3]
            y = float((Pl_r - Pr) @ Nr)
            if not np.isfinite(y):
                continue
            x_, y_, z_ = Pl_r
            G = np.array([
                [1, 0, 0], [0, 1, 0], [0, 0, 1],
                [0, -z_, y_], [z_, 0, -x_], [-y_, x_, 0],
            ])
            J = -(G @ Nr)
            roc = y / c
            tw = (1 - roc * roc) ** 2 if abs(y) <= c else 0.0
            w = (1.0 / Pr[2]) * tw
            JTJ += w * np.outer(J, J)
            JTy += w * J * y
            sq += y * y
            obs += 1
    return JTJ, JTy, sq, obs


def weighted_huber_dual_ascent_p(p, u, g, sigma, alpha):
    """Scalar WeightedHuberGradU_DualAscentP (cu_rof_denoising.cu:114-141):
    q <- project_unit_ball((q + sigma g gradfwd(u)) / (1 + sigma alpha)).
    p is (H, W, 2)."""
    H, W = u.shape
    out = np.zeros_like(p)
    for y in range(H):
        for x in range(W):
            dx = u[y, x + 1] - u[y, x] if x < W - 1 else 0.0
            dy = u[y + 1, x] - u[y, x] if y < H - 1 else 0.0
            qx = (p[y, x, 0] + sigma * g[y, x] * dx) / (1 + sigma * alpha)
            qy = (p[y, x, 1] + sigma * g[y, x] * dy) / (1 + sigma * alpha)
            n = np.sqrt(qx * qx + qy * qy)
            scale = max(1.0, n)
            out[y, x] = (qx / scale, qy / scale)
    return out


def weighted_l2_primal_descent(u, p, a, g, tau, lam):
    """Scalar WeightedL2_u_minus_g_PrimalDescent (cu_rof_denoising.cu:211-236):
    u <- (u + tau (g div(p) + lam a)) / (1 + tau lam) with backward-diff
    divergence (DivA, Divergence.h:52-59)."""
    H, W = u.shape
    out = np.zeros_like(u)
    for y in range(H):
        for x in range(W):
            div = p[y, x, 0] + p[y, x, 1]
            if x > 0:
                div -= p[y, x - 1, 0]
            if y > 0:
                div -= p[y - 1, x, 1]
            out[y, x] = (u[y, x] + tau * (g[y, x] * div + lam * a[y, x])) / (
                1 + tau * lam)
    return out
