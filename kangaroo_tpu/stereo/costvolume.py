"""Cost-volume reductions: WTA disparity, subpixel refinement, auxiliary-step
minimisation, edge weights, LR consistency, and photometric volumes.

TPU-native equivalent of src/cu_dense_stereo.cu. Volumes are (D, H, W)
float32; disparity images are (H, W) float32 (NaN = invalid) or int32 (-1 =
invalid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import invalid as invalid_mod
from ..core import sampling

_BIG = jnp.float32(1e10)


def _xr_valid(W: int, D: int, sd: int):
    """Mask (D, W): is x + sd*d inside the image (cu_dense_stereo.cu:76-78)."""
    x = jnp.arange(W)[None, :]
    d = jnp.arange(D)[:, None]
    xr = x + sd * d
    return (xr >= 0) & (xr < W)


def cost_vol_minimum(vol, max_disp: int | None = None):
    """WTA argmin over d with per-x clip d < min(maxDisp, x+1)
    (CostVolMinimum, cu_dense_stereo.cu:26-60). Returns int32 disparity."""
    D, H, W = vol.shape
    d = jnp.arange(D)[:, None, None]
    x = jnp.arange(W)[None, None, :]
    ok = d <= x
    if max_disp is not None and max_disp < D:
        ok = ok & (d < max_disp)
    masked = jnp.where(ok, vol, _BIG)
    return jnp.argmin(masked, axis=0).astype(jnp.int32)


def _planes_at_pair(vol, il, ir):
    """``vol[il, y, x]`` and ``vol[ir, y, x]`` per pixel via one-hot masked
    sums instead of ``take_along_axis``: a per-pixel gather along d lowers
    to a ~7 ns/elem lane gather on TPU (7.7 ms/call at VGA/64 — it made the
    sharded-DTAM alternation 45x slower than the Pallas whole-solve), while
    the fused select+add pass streams the volume once at HBM rate
    (0.035 ms). Bit-equal: the one-hot rows are exclusive and exhaustive
    for in-range indices. Both sums fuse into ONE volume read."""
    di = jnp.arange(vol.shape[0])[:, None, None]
    vl = jnp.sum(jnp.where(di == il[None], vol, 0.0), axis=0)
    vr = jnp.sum(jnp.where(di == ir[None], vol, 0.0), axis=0)
    return vl, vr


@functools.partial(jax.jit, static_argnames=("sd",))
def cost_vol_minimum_subpix(vol, sd: int = -1):
    """WTA + parabola refinement (CostVolMinimumSubpix, cu_dense_stereo.cu:67-116).

    Searches all d with x + sd*d in bounds; refines with the 3-point parabola
    when the best match pixel is strictly interior and the fitted minimum lies
    within (best-1, best+1).
    """
    vol = vol.astype(jnp.float32)  # bf16 volumes: arithmetic in f32, like
    D, H, W = vol.shape            # the Pallas twin's in-kernel upcast
    ok = _xr_valid(W, D, sd)[:, None, :]
    masked = jnp.where(ok, vol, _BIG)
    bestd = jnp.argmin(masked, axis=0)
    bestc = jnp.min(masked, axis=0)

    dl = jnp.clip(bestd - 1, 0, D - 1)
    dr = jnp.clip(bestd + 1, 0, D - 1)
    sl, sr = _planes_at_pair(vol, dl, dr)
    denom = 2.0 * (sr - 2.0 * bestc + sl)
    subpix = bestd - (sr - sl) / denom

    x = jnp.arange(W)[None, :]
    bestxr = x + sd * bestd
    interior = (bestxr > 0) & (bestxr < W - 1)
    sensible = (subpix > bestd - 1) & (subpix < bestd + 1)
    return jnp.where(interior & sensible, subpix, bestd.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("sd",))
def cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd: int = -1):
    """Auxiliary-variable exhaustive search of the DTAM alternation:
    argmin_d 1/(2 theta) (lastd - d)^2 + lambda C(x, d), plus Newton subpixel
    step (CostVolMinimumSquarePenaltySubpix, cu_dense_stereo.cu:123-174)."""
    vol = vol.astype(jnp.float32)  # see cost_vol_minimum_subpix
    D, H, W = vol.shape
    inv2theta = 1.0 / (2.0 * theta)
    d = jnp.arange(D, dtype=jnp.float32)[:, None, None]
    cost = inv2theta * (last_disp[None] - d) ** 2 + lam * vol
    ok = _xr_valid(W, D, sd)[:, None, :]
    masked = jnp.where(ok, cost, _BIG)
    bestd = jnp.argmin(masked, axis=0)
    bestc = jnp.min(masked, axis=0)

    # Parabola neighbours: the quadratic penalty is evaluated at the unclamped
    # d+-1 while the volume read clamps the index (the reference reads out of
    # bounds at the volume edge; we pin the read like the golden model).
    dl = bestd - 1
    dr = bestd + 1
    vl, vr = _planes_at_pair(vol, jnp.clip(dl, 0, D - 1),
                             jnp.clip(dr, 0, D - 1))
    cl = inv2theta * (last_disp - dl) ** 2 + lam * vl
    cr = inv2theta * (last_disp - dr) ** 2 + lam * vr
    subpix = bestd - (cr - cl) / (2.0 * (cr - 2.0 * bestc + cl))

    x = jnp.arange(W)[None, :]
    bestxr = x + sd * bestd
    interior = (bestxr > 0) & (bestxr < W - 1)
    sensible = (subpix > bestd - 1) & (subpix < bestd + 1)
    return jnp.where(interior & sensible, subpix, bestd.astype(jnp.float32))


@jax.jit
def exponential_edge_weight(img, alpha, beta):
    """g = exp(-alpha * |grad I|^beta) (ExponentialEdgeWeight,
    cu_dense_stereo.cu:180-202). Gradients are zero on the image border."""
    H, W = img.shape
    gx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) / 2.0
    gy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) / 2.0
    x = jnp.arange(W)[None, :]
    y = jnp.arange(H)[:, None]
    gx = jnp.where((x > 0) & (x < W - 1), gx, 0.0)
    gy = jnp.where((y > 0) & (y < H - 1), gy, 0.0)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.exp(-alpha * jnp.power(mag, beta))


@jax.jit
def reanchor_right(agg_l):
    """Re-anchor a left-anchored cost/aggregation volume on the right-image
    lattice: ``aggR[d, y, x] = aggL[d, y, x + d]``.

    Implemented as per-d LANE ROLLS, not ``take_along_axis`` (an index
    affine in position lowers to a lane gather on TPU; rolls measured
    0.026 ms vs the 2.3 ms second census+aggregation path they replace —
    docs/PARITY.md deviation 10). Wrapped lanes land at ``x + d >= W``
    where the right-anchored lattice mask (``_xr_valid`` with ``sd=1``)
    already rejects them, so downstream WTA/subpix stay correct."""
    D = agg_l.shape[0]
    return jnp.stack([jnp.roll(agg_l[d], -d, axis=1) for d in range(D)],
                     axis=0)


@functools.partial(jax.jit, static_argnames=("sd",))
def left_right_check(disp_l, disp_r, sd: int = -1, max_diff=0.5):
    """Invalidate left disparities inconsistent with the right image's
    (LeftRightCheck, cu_dense_stereo.cu:512-546). Float disparities only;
    invalid = NaN."""
    H, W = disp_l.shape
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    xr = x + sd * disp_l
    in_img = (xr >= 0) & (xr < W)
    xi = jnp.clip(xr, 0, W - 1).astype(jnp.int32)
    dr = jnp.take_along_axis(disp_r, xi, axis=1)
    ok = in_img & invalid_mod.is_valid(dr) & (jnp.abs(disp_l - dr) <= max_diff)
    return jnp.where(ok, disp_l, jnp.nan)


@jax.jit
def filter_disp_grad(disp, threshold):
    """Invalidate (set -1) pixels whose disparity gradient magnitude^2 exceeds
    threshold (FilterDispGrad, cu_dense_stereo.cu:793-812)."""
    dx, dy = _central_diff_image(disp)
    valid = dx * dx + dy * dy < threshold
    return jnp.where(valid, disp, -1.0)


def _central_diff_image(img):
    dx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) / 2.0
    dy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) / 2.0
    # clamped boundary: reference GetCentralDiff reads clamped neighbours
    dx = dx.at[:, 0].set((img[:, 1] - img[:, 0]) / 2.0)
    dx = dx.at[:, -1].set((img[:, -1] - img[:, -2]) / 2.0)
    dy = dy.at[0].set((img[1] - img[0]) / 2.0)
    dy = dy.at[-1].set((img[-1] - img[-2]) / 2.0)
    return dx, dy


@functools.partial(jax.jit, static_argnames=("max_disp", "sd"))
def cost_volume_from_stereo_truncated_abs_and_grad(
    img_l, img_r, max_disp: int, sd: int = -1, alpha=0.0, r1=1e37, r2=1e37
):
    """Truncated |dI| + |d(gradx I)| matching cost (Rhemann et al.;
    CostVolumeFromStereoTruncatedAbsAndGrad, cu_dense_stereo.cu:820-848).

    Note the reference kernel overrides alpha=0, r1=1e37 internally
    (cu_dense_stereo.cu:829-830); defaults here reproduce that behaviour but
    the parameters are honoured when passed.
    """
    H, W = img_l.shape
    gx_l, _ = _central_diff_image(img_l)
    gx_r, _ = _central_diff_image(img_r)
    x = jnp.arange(W)

    def slice_d(d):
        xr = x + sd * d
        ok = (xr >= 0) & (xr < W)
        xi = jnp.clip(xr, 0, W - 1)
        abs_i = jnp.abs(img_r[:, xi] - img_l)
        abs_g = jnp.abs(gx_r[:, xi] - gx_l)
        cost = (1.0 - alpha) * jnp.minimum(abs_i, r1) + alpha * jnp.minimum(abs_g, r2)
        oob = (1.0 - alpha) * r1 + alpha * r2
        return jnp.where(ok[None, :], cost, oob)

    # vmap over the disparity axis: one trace regardless of max_disp
    return jax.vmap(slice_d)(jnp.arange(max_disp))


# --- CostVolElem volumes (running mean accumulators) ------------------------


@functools.partial(jax.jit, static_argnames=("max_disp", "sd", "rad"))
def cost_volume_from_stereo(img_l, img_r, max_disp: int, sd: int = -1, rad: int = 2):
    """Zero-mean SAD (SAND) patch cost volume as a running-mean accumulator
    (CostVolumeFromStereo, cu_dense_stereo.cu:668-689). Returns (n, sum) with
    n = 1 inside the valid region, 0 outside (CostVolElem.h:10-19)."""
    H, W = img_l.shape
    f_l = img_l.astype(jnp.float32)
    f_r = img_r.astype(jnp.float32)

    # patch sums via separable box filters (zero padding like raw patch reads
    # guarded by the InBounds test below)
    def box(img):
        k = 2 * rad + 1
        s = jnp.cumsum(jnp.pad(img, ((rad + 1, rad), (0, 0))), axis=0)
        img = s[k:] - s[:-k]
        s = jnp.cumsum(jnp.pad(img, ((0, 0), (rad + 1, rad))), axis=1)
        return s[:, k:] - s[:, :-k]

    n_pix = (2 * rad + 1) ** 2
    mean_l = box(f_l) / n_pix
    mean_r = box(f_r) / n_pix

    x = jnp.arange(W)
    y = jnp.arange(H)[:, None]
    in_l = (x[None, :] >= rad) & (x[None, :] < W - rad) & (y >= rad) & (y < H - rad)

    def zm_patch_sad(d):
        xr = x + sd * d
        okx = (xr >= rad) & (xr < W - rad)
        xi = jnp.clip(xr, 0, W - 1)
        acc = jnp.zeros((H, W), jnp.float32)
        for dy in range(-rad, rad + 1):
            ys = jnp.clip(y + dy, 0, H - 1)[:, 0]
            row_l = f_l[ys][:, :]
            row_r = f_r[ys][:, :]
            for dx in range(-rad, rad + 1):
                xl = jnp.clip(x + dx, 0, W - 1)
                xrr = jnp.clip(xi + dx, 0, W - 1)
                acc = acc + jnp.abs(
                    (row_l[:, xl] - mean_l) - (row_r[:, xrr] - mean_r[:, xi])
                )
        ok = in_l & okx[None, :]
        return jnp.where(ok, acc, 0.0), ok.astype(jnp.float32)

    # vmap over the disparity axis: the (2*rad+1)^2 patch taps trace ONCE
    # instead of max_disp times (rad=3, D=64 used to take minutes to trace)
    sums, ns = jax.vmap(zm_patch_sad)(jnp.arange(max_disp))
    return ns, sums


def cost_elem_to_float(n, s):
    """CostVolElem::operator float: sum/n, 1e30 when n == 0 (CostVolElem.h:14-18)."""
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 1e30)


def cost_volume_zero(max_disp: int, h: int, w: int):
    """Zeroed running-mean cost volume (CostVolumeZero, cu_dense_stereo.cu:652)."""
    return (
        jnp.zeros((max_disp, h, w), jnp.float32),
        jnp.zeros((max_disp, h, w), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("rad",))
def cost_volume_add(n, s, img_v, img_c, KT_cv, K, baseline, rad: int = 1):
    """Accumulate a posed view into a running-mean cost volume
    (CostVolumeAdd, cu_dense_stereo.cu:693-731).

    For each (u, v, d): unproject at depth fu*baseline/d in the volume
    ("keyframe") camera, project into the contributing camera via KT_cv
    (3, 4), and add the zero-mean SAD patch score between img_v at (u, v) and
    img_c sampled bilinearly at the projection. (n, s) are the (D, H, W)
    count/sum accumulators; returns the updated pair.
    """
    D, H, W = n.shape
    fv_img = img_v.astype(jnp.float32)
    fc_img = img_c.astype(jnp.float32)
    area = float((2 * rad + 1) ** 2)
    vgrid, ugrid = jnp.mgrid[0:H, 0:W].astype(jnp.float32)

    def one_d(d):
        z = K.fu * baseline / jnp.maximum(d.astype(jnp.float32), 1e-9)
        Pv = jnp.stack(
            [z * (ugrid - K.u0) / K.fu, z * (vgrid - K.v0) / K.fv,
             jnp.broadcast_to(z, ugrid.shape)], axis=-1,
        )
        KPc = Pv @ KT_cv[:, :3].T + KT_cv[:, 3]
        pu = KPc[..., 0] / KPc[..., 2]
        pv = KPc[..., 1] / KPc[..., 2]
        ok = (KPc[..., 2] > 0) & sampling.in_bounds(fc_img, pu, pv, 5)
        # zero-mean SAD with bilinear access on the contributing image
        mean_v = jnp.zeros_like(fv_img)
        mean_c = jnp.zeros_like(fv_img)
        for dy in range(-rad, rad + 1):
            for dx in range(-rad, rad + 1):
                mean_v = mean_v + sampling.get_clamped(
                    fv_img, jnp.clip(ugrid.astype(jnp.int32) + dx, 0, W - 1),
                    jnp.clip(vgrid.astype(jnp.int32) + dy, 0, H - 1))
                mean_c = mean_c + sampling.bilinear(fc_img, pu + dx, pv + dy)
        mean_v = mean_v / area
        mean_c = mean_c / area
        acc = jnp.zeros_like(fv_img)
        for dy in range(-rad, rad + 1):
            for dx in range(-rad, rad + 1):
                a = sampling.get_clamped(
                    fv_img, jnp.clip(ugrid.astype(jnp.int32) + dx, 0, W - 1),
                    jnp.clip(vgrid.astype(jnp.int32) + dy, 0, H - 1))
                b = sampling.bilinear(fc_img, pu + dx, pv + dy)
                acc = acc + jnp.abs((a - mean_v) - (b - mean_c))
        return jnp.where(ok, acc / area, 0.0), ok.astype(jnp.float32)

    scores, oks = jax.vmap(one_d)(jnp.arange(D))
    return n + oks, s + scores
