"""Multi-chip sharded variants of the hot pipelines.

The reference is a single-GPU library; these are the ICI-scaling strategies
SURVEY.md §2.4 plans as first-class components:

  * stereo: shard the **disparity axis** of the cost volume — each chip
    builds and aggregates its disparity slab, WTA combines with a global
    argmin (one small all-gather of per-shard minima);
  * fusion: shard the **voxel z axis** — TSDF fuse needs no communication
    (each chip owns a slab); raycast runs per-slab and combines by nearest
    finite depth (psum-style min reduce);
  * stencils: shard **image rows** with halo exchange via ``ppermute``;
  * solvers: shard rows and ``psum`` the per-shard normal equations.

All functions take an explicit Mesh with one axis named "shard" and run under
``shard_map``, so they compile the same for 8 virtual CPU devices (tests) and
real ICI-connected TPU chips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..containers.volume import TsdfVolume
from ..core import se3
from ..fusion import raycast as rc
from ..fusion import sdf as sdf_mod
from ..solvers import icp as icp_mod
from ..stereo import census as census_mod
from ..stereo import costvolume as cv

AXIS = "shard"


# --------------------------------------------------------------------------
# Halo exchange for row-sharded stencils
# --------------------------------------------------------------------------


def halo_exchange_rows(block, halo: int):
    """Append ``halo`` rows from the neighbouring shards (edge-replicated at
    the mesh ends), for stencil ops on a row-sharded image. Runs inside
    shard_map; uses ppermute over the ring."""
    n = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    top = block[:halo]
    bot = block[-halo:]
    # send my top rows to the previous shard (they become its bottom halo)
    from_next = jax.lax.ppermute(top, AXIS, [(i, (i - 1) % n) for i in range(n)])
    from_prev = jax.lax.ppermute(bot, AXIS, [(i, (i + 1) % n) for i in range(n)])
    # edge shards replicate their own border rows (clamped boundary)
    from_prev = jnp.where(idx == 0, jnp.broadcast_to(block[:1], from_prev.shape), from_prev)
    from_next = jnp.where(
        idx == n - 1, jnp.broadcast_to(block[-1:], from_next.shape), from_next
    )
    return jnp.concatenate([from_prev, block, from_next], axis=0)


def sharded_stencil_rows(fn, mesh, halo: int):
    """Lift ``fn(img) -> img`` (a local stencil with radius <= halo) to a
    row-sharded image: halo-exchange, apply, crop."""

    def local(img_block):
        padded = halo_exchange_rows(img_block, halo)
        out = fn(padded)
        return out[halo:-halo]

    return shard_map(
        local, mesh=mesh, in_specs=P(AXIS, None), out_specs=P(AXIS, None)
    )


# --------------------------------------------------------------------------
# Disparity-sharded stereo
# --------------------------------------------------------------------------


def sharded_census_wta(left_img, right_img, max_disp: int, mesh,
                       window: str = "9x7"):
    """Cost-volume build + WTA with the disparity axis sharded.

    Census transforms are computed replicated (cheap); each shard scores its
    disparity slab with the single-chip lane-roll pattern (stereo/census.py:
    per-disparity shifts are ``jnp.roll``s, never clipped fancy indexing —
    a hidden lane gather on TPU) and keeps a running (min cost, argmin d)
    pair in-register instead of materialising the slab; the global WTA is a
    single tiny ``all_gather`` of the n per-shard minima. Shards own
    disjoint ascending disparity ranges, so the first cross-shard minimum is
    the smallest-d winner — matching ``cost_vol_minimum``'s argmin
    tie-break exactly. Returns int32 disparity.
    """
    n = mesh.devices.size
    assert max_disp % n == 0, "max_disp must divide the mesh"
    d_per = max_disp // n
    inv_bits = 1.0 / census_mod.norm_bits(window)

    cl = census_mod.census(left_img, window)
    cr = census_mod.census(right_img, window)

    def local(cl_rep, cr_rep):
        shard = jax.lax.axis_index(AXIS)
        d0 = shard * d_per
        H, W, K = cl_rep.shape
        x = jnp.arange(W)[None, :]
        # one dynamic-shift roll to the slab base (two dynamic slices), then
        # static lane rolls per in-slab disparity
        r_base = jnp.roll(cr_rep, d0, axis=1)
        best_c = jnp.full((H, W), jnp.inf, jnp.float32)
        best_d = jnp.full((H, W), 0, jnp.int32)
        for i in range(d_per):
            d = d0 + i
            r = jnp.roll(r_base, i, axis=1)
            ham = census_mod.hamming_distance(cl_rep, r).astype(jnp.float32)
            # d <= x is the cost_vol_minimum lattice clip; it subsumes the
            # x-d in-bounds mask, so wrapped lanes never win
            cost = jnp.where(d <= x, ham * inv_bits, 1e10)
            better = cost < best_c
            best_c = jnp.where(better, cost, best_c)
            best_d = jnp.where(better, d, best_d)
        # global argmin across shards; argmin's first-occurrence tie-break
        # over ascending shard order IS the smallest-d tie-break
        all_c = jax.lax.all_gather(best_c, AXIS)  # (n, H, W)
        all_d = jax.lax.all_gather(best_d, AXIS)
        win = jnp.argmin(all_c, axis=0)
        sel = jnp.arange(n)[:, None, None] == win[None]
        return jnp.sum(jnp.where(sel, all_d, 0), axis=0)

    f = shard_map(local, mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False)
    return f(cl, cr)


# --------------------------------------------------------------------------
# Disparity-sharded DTAM variational stereo
# --------------------------------------------------------------------------


def _dtam_slab_wta(vol_ext, d0_base, last_disp, lam, inv2theta, sd: int,
                   D: int):
    """Local square-penalty WTA over one disparity slab.

    ``vol_ext`` is (dper + 2, H, W): the shard's slab with a one-plane halo
    on each side (edge shards replicate their boundary plane), so the
    parabola neighbours clamp(bestd +- 1, 0, D-1) are always local reads.
    With ``inv2theta = 0, lam = 1`` this degrades exactly to the plain
    subpixel WTA (CostVolMinimumSubpix) arithmetic. Returns the local
    (bestc, bestd_global_f32, vl, vr) images.
    """
    dper = vol_ext.shape[0] - 2
    slab = vol_ext[1:-1]
    H, W = slab.shape[1:]
    dglob = d0_base + jnp.arange(dper, dtype=jnp.float32)[:, None, None]
    cost = inv2theta * (last_disp[None] - dglob) ** 2 + lam * slab
    x = jnp.arange(W)[None, None, :]
    ok = (x + sd * dglob >= 0) & (x + sd * dglob < W)
    masked = jnp.where(ok, cost, 1e10)
    ibest = jnp.argmin(masked, axis=0)
    bestc = jnp.min(masked, axis=0)
    # ext[k] = vol[d0_base - 1 + k] with the global edges clamped by the
    # halo replication, so ext[ibest] IS vol[clip(bestd-1, 0)] and
    # ext[ibest + 2] IS vol[clip(bestd+1, D-1)]. One-hot masked sums, not
    # take_along_axis — the per-pixel d gather is a ~7.7 ms/call lane
    # gather at VGA/64 (it cost the sharded alternation 45x); the masked
    # sums fuse into one slab stream (costvolume._planes_at_pair).
    from ..stereo.costvolume import _planes_at_pair

    vl, vr = _planes_at_pair(vol_ext, ibest, ibest + 2)
    bestd = d0_base + ibest.astype(jnp.float32)
    return bestc, bestd, vl, vr


def _dtam_wta_combine(bestc, bestd, vl, vr, last_disp, lam, inv2theta,
                      sd: int, D: int, W: int):
    """Cross-shard argmin + the single-device subpixel refinement.

    The global minimum is a ``pmin``; the smallest-shard tie-break equals
    the single-device argmin's first-occurrence (= smallest d) tie-break
    because slabs own ascending disparity ranges. Payloads (bestd, vl, vr)
    ride a winner-masked psum. The parabola and validity masks then follow
    costvolume.cost_vol_minimum_square_penalty_subpix verbatim.
    """
    shard = jax.lax.axis_index(AXIS)
    nsh = jax.lax.axis_size(AXIS)
    best_all = jax.lax.pmin(bestc, AXIS)
    mine = bestc == best_all
    win = jax.lax.pmin(jnp.where(mine, shard, nsh), AXIS)
    winner = mine & (shard == win)

    def pick(v):
        return jax.lax.psum(jnp.where(winner, v, 0.0), AXIS)

    bestd = pick(bestd)
    vl = pick(vl)
    vr = pick(vr)
    dl = bestd - 1.0
    dr = bestd + 1.0
    cl = inv2theta * (last_disp - dl) ** 2 + lam * vl
    cr = inv2theta * (last_disp - dr) ** 2 + lam * vr
    subpix = bestd - (cr - cl) / (2.0 * (cr - 2.0 * best_all + cl))
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    bestxr = x + sd * bestd
    interior = (bestxr > 0) & (bestxr < W - 1)
    sensible = (subpix > dl) & (subpix < dr)
    return jnp.where(interior & sensible, subpix, bestd)


def sharded_dtam_solve(vol, img_left, lam, theta_start, sigma_q, sigma_d,
                       huber_alpha, beta, g_alpha, g_beta, mesh,
                       iterations: int = 80, sd: int = -1):
    """The DTAM primal-dual/exhaustive-search alternation
    (applications/stereo/main.cpp:368-383) with the cost volume's
    **disparity axis sharded** over the mesh — SURVEY.md §2.4's 'shard the
    disparity axis of the cost volume for stereo' for the variational app.

    Per iteration the image-space half-steps (WeightedHuberGradU_DualAscentP
    + WeightedL2_u_minus_g_PrimalDescent, cu_rof_denoising.cu:114-141,
    211-236) are (H, W) stencils — they run replicated on every shard (the
    cost of ~10 VGA planes is negligible next to the volume sweep and saves
    a broadcast). The auxiliary exhaustive search
    (CostVolMinimumSquarePenaltySubpix, cu_dense_stereo.cu:123-174) — the
    framework's single-chip compute floor (docs/PERF.md) — is where the
    FLOPs are, and it is embarrassingly D-parallel: each shard sweeps its
    disparity slab locally and the global WTA is one pmin + three
    winner-masked psums of (H, W) images per iteration. The one-plane
    disparity halo for the subpixel parabola is exchanged ONCE before the
    loop (ppermute).

    Bit-equal to the single-device ``apps.stereo.dtam_solve`` XLA twin
    (same arithmetic, same tie-breaks — tests/test_parallel.py).

    ``vol`` is (D, H, W) replicated or D-sharded; returns the refined
    (H, W) disparity, replicated.
    """
    from ..stereo import costvolume as cv_mod
    from ..variational import rof as rof_mod

    D, H, W = vol.shape
    n = mesh.devices.size
    assert D % n == 0, "disparity planes must divide the mesh"
    dper = D // n

    g_img = img_left.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(img_left).dtype, jnp.integer):
        g_img = g_img / 255.0
    g = cv_mod.exponential_edge_weight(g_img, g_alpha, g_beta)

    def local(v_slab, g_rep):
        shard = jax.lax.axis_index(AXIS)
        nsh = jax.lax.axis_size(AXIS)
        v32 = v_slab.astype(jnp.float32)
        d0_base = (shard * dper).astype(jnp.float32)
        # one-plane halo each side; edge shards replicate their boundary
        # plane so clamp(bestd-1, 0) / clamp(bestd+1, D-1) read in-slab
        from_prev = jax.lax.ppermute(
            v32[-1:], AXIS, [(i, (i + 1) % nsh) for i in range(nsh)])
        from_next = jax.lax.ppermute(
            v32[:1], AXIS, [(i, (i - 1) % nsh) for i in range(nsh)])
        lo = jnp.where(shard == 0, v32[:1], from_prev)
        hi = jnp.where(shard == nsh - 1, v32[-1:], from_next)
        v_ext = jnp.concatenate([lo, v32, hi], axis=0)

        def wta(last_disp, lam_v, inv2theta):
            parts = _dtam_slab_wta(v_ext, d0_base, last_disp, lam_v,
                                   inv2theta, sd, D)
            return _dtam_wta_combine(*parts, last_disp, lam_v, inv2theta,
                                     sd, D, W)

        zero = jnp.zeros((H, W), jnp.float32)
        d0 = wta(zero, 1.0, 0.0)  # == cost_vol_minimum_subpix

        def body(it, carry):
            dcur, a, q, theta = carry
            q = rof_mod.weighted_huber_dual_ascent_p(q, dcur, g_rep, sigma_q,
                                                     huber_alpha)
            dcur = rof_mod.weighted_l2_primal_descent(dcur, q, a, g_rep,
                                                      sigma_d, 1.0 / theta)
            a = wta(dcur, lam, 0.5 / theta)
            theta = theta * (1.0 - beta * (it + 1.0))
            return dcur, a, q, theta

        q0 = jnp.zeros((H, W, 2), jnp.float32)
        dfin, _, _, _ = jax.lax.fori_loop(
            0, iterations, body, (d0, d0, q0, jnp.float32(theta_start)))
        return dfin

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return f(vol, g)


# --------------------------------------------------------------------------
# Voxel-z-sharded TSDF fusion + raycast
# --------------------------------------------------------------------------


def shard_volume_z(vol: TsdfVolume, mesh) -> TsdfVolume:
    """Place a TsdfVolume with its z (leading) axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(AXIS, None, None))
    return TsdfVolume(
        jax.device_put(vol.val, sh), jax.device_put(vol.weight, sh), vol.bbox
    )


def shard_bounded_volume_z(bv, mesh):
    """Place a BoundedVolume (e.g. the colour volume) z-sharded to match."""
    from ..containers.volume import BoundedVolume

    sh = NamedSharding(mesh, P(AXIS, None, None))
    return BoundedVolume(jax.device_put(bv.data, sh), bv.bbox)


def sharded_sdf_fuse(vol: TsdfVolume, depth, normals, T_cw, K, trunc_dist,
                     max_w, mincostheta, mesh) -> TsdfVolume:
    """TSDF fuse with the voxel z axis sharded: zero communication — each
    chip projects and updates only its slab (SURVEY.md §2.4: 'shard the voxel
    z-axis for TSDF fuse (no comm needed)')."""
    D = vol.d
    n = mesh.devices.size

    def local(val, weight, depth, normals, T_cw, lo, hi):
        shard = jax.lax.axis_index(AXIS)
        lo_s, hi_s = _slab_bbox_from(lo, hi, D, n, shard)
        from ..containers.bbox import BoundingBox

        sub = TsdfVolume(val, weight, BoundingBox(lo_s, hi_s))
        out = sdf_mod.sdf_fuse(sub, depth, normals, T_cw, K, trunc_dist, max_w, mincostheta)
        return out.val, out.weight

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None, None), P(), P(), P(), P(), P()),
        out_specs=(P(AXIS, None, None), P(AXIS, None, None)),
        check_vma=False,
    )
    val, weight = f(vol.val, vol.weight, depth, normals, jnp.asarray(T_cw),
                    vol.bbox.lo, vol.bbox.hi)
    return TsdfVolume(val, weight, vol.bbox)


def _slab_bbox_from(lo, hi, d_total: int, n: int, shard_idx, extra: int = 0):
    """World bbox of z-slab ``shard_idx``; ``extra`` extends past the slab by
    that many halo planes (clamped conceptually — the caller duplicates the
    final plane on the last shard so the degenerate cell has no crossings)."""
    d_per = d_total // n
    z0 = shard_idx * d_per
    z1 = z0 + d_per - 1 + extra
    size = hi - lo
    zlo = lo[2] + size[2] * z0 / (d_total - 1)
    zhi = lo[2] + size[2] * z1 / (d_total - 1)
    return (
        jnp.stack([lo[0], lo[1], zlo]),
        jnp.stack([hi[0], hi[1], zhi]),
    )


def sharded_raycast(vol: TsdfVolume, T_wc, K, w: int, h: int, mesh,
                    near=0.1, far=10.0, trunc_dist=None, max_steps: int = 512):
    """Raycast a z-sharded TSDF: each chip sphere-traces its slab (the slabs
    partition space, so each ray hits at most one surface per slab) and the
    nearest finite depth wins — a single min-reduce across the mesh
    (SURVEY.md §2.4: 'per-shard raycast + min-depth all-reduce')."""
    D = vol.d
    n = mesh.devices.size

    def local(val, weight, lo, hi):
        shard = jax.lax.axis_index(AXIS)
        nsh = jax.lax.axis_size(AXIS)
        # one-plane halo from the next shard so the interpolation cell
        # between slabs is owned by the lower slab (no missed crossings)
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        val_next = jax.lax.ppermute(val[:1], AXIS, perm)
        w_next = jax.lax.ppermute(weight[:1], AXIS, perm)
        last = shard == nsh - 1
        val_ext = jnp.concatenate(
            [val, jnp.where(last, val[-1:], val_next)], axis=0
        )
        w_ext = jnp.concatenate([weight, jnp.where(last, weight[-1:], w_next)], axis=0)
        lo_s, hi_s = _slab_bbox_from(lo, hi, D, n, shard, extra=1)
        from ..containers.bbox import BoundingBox

        sub = TsdfVolume(val_ext, w_ext, BoundingBox(lo_s, hi_s))
        d, nrm, img = rc.raycast_sdf(sub, T_wc, K, w, h, near, far,
                                     trunc_dist=trunc_dist, max_steps=max_steps)
        d_safe = jnp.where(jnp.isfinite(d), d, jnp.inf)
        best = jax.lax.pmin(d_safe, AXIS)
        mine = d_safe == best
        # exactly one winner per pixel: the lowest shard index among the
        # ties, selected sign-safely with a psum of the masked payload (a
        # pmax of zeroed losers would clamp negative normal components).
        win_idx = jax.lax.pmin(jnp.where(mine, shard, nsh), AXIS)
        winner = mine & (shard == win_idx)
        nrm = jax.lax.psum(jnp.where(winner[..., None], nrm, 0.0), AXIS)
        img = jax.lax.psum(jnp.where(winner, img, 0.0), AXIS)
        depth = jnp.where(jnp.isfinite(best), best, jnp.nan)
        return depth, nrm, img

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None, None), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return f(vol.val, vol.weight, vol.bbox.lo, vol.bbox.hi)


def sharded_sdf_fuse_separable(vol: TsdfVolume, depth, normals, T_cw, K,
                               trunc_dist, max_w, mincostheta, mesh,
                               enable=None, near=None,
                               far=None) -> TsdfVolume:
    """Plane-sweep TSDF fuse (fusion/separable.py) with the voxel z axis
    sharded: each chip runs the shear-scale-warp sweep over its own slab of
    planes (its sub-volume bbox makes the factorization self-consistent) —
    still zero communication, now gather-free and MXU-bound per chip.

    ``enable``/``near``/``far`` thread through to the single-device fuse
    (the tracking gate and the knear/kfar ROI crop, needed by the sharded
    frame step). The dynamic plane window evaluates the same per-plane
    predicate on each shard's slab, so results match the single-device
    fuse exactly."""
    from ..fusion import separable as sep

    D = vol.d
    n = mesh.devices.size

    def local(val, weight, depth, normals, T_cw, en, lo, hi):
        shard = jax.lax.axis_index(AXIS)
        lo_s, hi_s = _slab_bbox_from(lo, hi, D, n, shard)
        from ..containers.bbox import BoundingBox

        sub = TsdfVolume(val, weight, BoundingBox(lo_s, hi_s))
        out = sep.sdf_fuse_separable(sub, depth, normals, T_cw, K, trunc_dist,
                                     max_w, mincostheta, sweep_axis=0,
                                     enable=en, near=near, far=far)
        return out.val, out.weight

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None, None), P(), P(), P(),
                  P(), P(), P()),
        out_specs=(P(AXIS, None, None), P(AXIS, None, None)),
        check_vma=False,
    )
    en = jnp.asarray(True if enable is None else enable)
    val, weight = f(vol.val, vol.weight, depth, normals, jnp.asarray(T_cw),
                    en, vol.bbox.lo, vol.bbox.hi)
    return TsdfVolume(val, weight, vol.bbox)


def sharded_sdf_fuse_color_separable(vol: TsdfVolume, color_vol, depth,
                                     normals, T_cw, K, img, T_iw, K_img,
                                     trunc_dist, max_w, mincostheta, mesh,
                                     enable=None, near=None, far=None):
    """Colour-fusing plane-sweep fuse (fusion/separable.py
    sdf_fuse_color_separable, cu_sdffusion.cu:70-138) with BOTH volumes
    voxel-z sharded: each chip sweeps its slab for the TSDF and the colour
    camera's factorization alike — still zero communication (the image
    operands are replicated; the update masks are slab-local). Returns
    (TsdfVolume, BoundedVolume) like the single-device op."""
    from ..containers.volume import BoundedVolume
    from ..fusion import separable as sep

    D = vol.d
    n = mesh.devices.size

    def local(val, weight, cdata, depth, normals, T_cw, img, T_iw, en,
              lo, hi):
        shard = jax.lax.axis_index(AXIS)
        lo_s, hi_s = _slab_bbox_from(lo, hi, D, n, shard)
        from ..containers.bbox import BoundingBox

        sub = TsdfVolume(val, weight, BoundingBox(lo_s, hi_s))
        csub = BoundedVolume(cdata, BoundingBox(lo_s, hi_s))
        outv, outc = sep.sdf_fuse_color_separable(
            sub, csub, depth, normals, T_cw, K, img, T_iw, K_img,
            trunc_dist, max_w, mincostheta, sweep_axis=0, enable=en,
            near=near, far=far)
        return outv.val, outv.weight, outc.data

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None),) * 3 + (P(),) * 8,
        out_specs=(P(AXIS, None, None),) * 3,
        check_vma=False,
    )
    en = jnp.asarray(True if enable is None else enable)
    val, weight, cdata = f(vol.val, vol.weight, color_vol.data, depth,
                           normals, jnp.asarray(T_cw), img,
                           jnp.asarray(T_iw), en, vol.bbox.lo, vol.bbox.hi)
    return (TsdfVolume(val, weight, vol.bbox),
            BoundedVolume(cdata, color_vol.bbox))


def sharded_raycast_separable(vol: TsdfVolume, T_wc, K, w: int, h: int, mesh,
                              near=0.1, far=10.0, trunc_dist=None):
    """Plane-sweep raycast with the voxel z axis sharded: each chip sweeps
    its slab (plus a one-plane halo so slab-boundary crossings are owned by
    the lower shard), and the global first crossing along each ray is the
    minimum camera depth across shards — one pmin plus a winner-masked psum
    for the payload. The sweep axis is necessarily z (the sharded axis), so
    views nearly perpendicular to z keep the single-device auto-axis path."""
    from ..fusion import separable as sep

    D = vol.d
    n = mesh.devices.size

    def local(val, weight, lo, hi):
        shard = jax.lax.axis_index(AXIS)
        nsh = jax.lax.axis_size(AXIS)
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        val_next = jax.lax.ppermute(val[:1], AXIS, perm)
        w_next = jax.lax.ppermute(weight[:1], AXIS, perm)
        last = shard == nsh - 1
        val_ext = jnp.concatenate([val, jnp.where(last, val[-1:], val_next)], axis=0)
        w_ext = jnp.concatenate([weight, jnp.where(last, weight[-1:], w_next)], axis=0)
        lo_s, hi_s = _slab_bbox_from(lo, hi, D, n, shard, extra=1)
        from ..containers.bbox import BoundingBox

        sub = TsdfVolume(val_ext, w_ext, BoundingBox(lo_s, hi_s))
        d, nrm, img = sep.raycast_sdf_separable(
            sub, T_wc, K, w, h, near=near, far=far, trunc_dist=trunc_dist,
            sweep_axis=0)
        d_safe = jnp.where(jnp.isfinite(d), d, jnp.inf)
        best = jax.lax.pmin(d_safe, AXIS)
        mine = d_safe == best
        win_idx = jax.lax.pmin(jnp.where(mine, shard, nsh), AXIS)
        winner = mine & (shard == win_idx)
        nrm = jax.lax.psum(jnp.where(winner[..., None], nrm, 0.0), AXIS)
        img = jax.lax.psum(jnp.where(winner, img, 0.0), AXIS)
        depth = jnp.where(jnp.isfinite(best), best, jnp.nan)
        return depth, nrm, img

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None, None), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return f(vol.val, vol.weight, vol.bbox.lo, vol.bbox.hi)


# --------------------------------------------------------------------------
# Row-sharded ICP reduction
# --------------------------------------------------------------------------


def sharded_icp_point_plane(points_live, points_ref, normals_ref, KT_lr, T_rl,
                            c, mesh):
    """Point-plane ICP with image rows sharded: each chip reduces its rows'
    normal equations locally (MXU matmul), then one psum of the 6x6+6+2
    system crosses the ICI — the all-reduce analogue of the reference's
    block-tree + thrust reduction (LeastSquareSum.h:17-86).

    Note: the projective association gathers from the full live point image,
    so points_live stays replicated; only the reference-frame rows shard.
    """
    from ..solvers.lss import LSS

    def local(pl, pr, nr):
        s = icp_mod.icp_point_plane(pl, pr, nr, KT_lr, T_rl, c)
        return (
            jax.lax.psum(s.JTJ, AXIS),
            jax.lax.psum(s.JTy, AXIS),
            jax.lax.psum(s.sqErr, AXIS),
            jax.lax.psum(s.obs, AXIS),
        )

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(AXIS, None, None), P(AXIS, None, None)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    JTJ, JTy, sq, obs = f(points_live, points_ref, normals_ref)
    return LSS(JTJ, JTy, sq, obs)


# --------------------------------------------------------------------------
# Reshard-strategy SGM: column shards for vertical paths, one all_to_all,
# row shards for horizontal paths — every recurrence stays ON-chip.
# --------------------------------------------------------------------------


def sharded_semi_global_matching_reshard(vol, img, P1, P2, mesh, sd: int = -1):
    """4-path SGM where each path family runs on the axis it is INDEPENDENT
    over: vertical scans are per-column recurrences, so the volume starts
    column-sharded and each chip runs its full-height scans locally (the
    streaming Pallas kernel on TPU — no carry ever crosses a chip); one
    ``all_to_all`` reshards the volume + the vertical accumulator to row
    shards; horizontal scans run locally there. Exactly the single-device
    recurrences — no wavefront approximant — at the cost of two volume
    all_to_alls over ICI (~vol_bytes/n per chip each).

    Complements :func:`sharded_semi_global_matching` (the carry-wavefront
    strategy, which also supports the 8-path diagonals and keeps one
    sharding throughout). vol is (D, H, W) replicated or arbitrarily
    sharded; returns the aggregated (D, H, W) volume row-sharded.
    """
    from .. import backend
    from ..stereo import sgm as sgm_mod
    from ..stereo import sgm_pallas as sp

    D, H, W = vol.shape
    n = mesh.devices.size
    assert H % n == 0 and W % n == 0, "H and W must divide the mesh"
    mask_left = sd < 0

    def local(v_cols, img_rep):
        idx = jax.lax.axis_index(AXIS)
        nsh = jax.lax.axis_size(AXIS)
        Ws = v_cols.shape[2]
        Hs = H // n
        off = idx * Ws
        v32 = v_cols.astype(jnp.float32)
        img_cols = jax.lax.dynamic_slice(img_rep, (0, off), (H, Ws))

        # ---- vertical pair on local columns (full-height recurrences).
        # The gate must cover BOTH local passes: vertical scans length H
        # on column shards, horizontal scans length W on row shards after
        # the all_to_all — sgm_shapes_ok checks both axes (and D % 8).
        from ..stereo.dispatch import sgm_shapes_ok

        use_pallas = backend.use_pallas(sgm_shapes_ok((D, H, W)))
        if use_pallas:
            acc_v = sp.sgm_aggregate_scan(
                v32, img_cols, P1, P2, True,
                "left" if mask_left else "right", scan_is_x=False,
                width=W, lane_offset=off)
        else:
            vhwd = jnp.moveaxis(v32, 0, -1)  # (H, Ws, D)
            d = jnp.arange(D)[None, None, :]
            x = (off + jnp.arange(Ws))[None, :, None]
            dm = jnp.broadcast_to((d <= x) if mask_left else (x + d < W),
                                  (H, Ws, D))
            agg = sgm_mod._scan_direction(vhwd, img_cols, dm, P1, P2, False)
            agg = agg + sgm_mod._scan_direction(vhwd, img_cols, dm, P1, P2,
                                                True)
            acc_v = jnp.moveaxis(agg, -1, 0)  # (D, H, Ws)

        # ---- reshard: (D, H, Ws) column shards -> (D, Hs, W) row shards
        acc_vr = jax.lax.all_to_all(acc_v, AXIS, split_axis=1, concat_axis=2,
                                    tiled=True)
        v_rows = jax.lax.all_to_all(v32, AXIS, split_axis=1, concat_axis=2,
                                    tiled=True)
        img_rows = jax.lax.dynamic_slice(img_rep, (idx * Hs, 0), (Hs, W))

        # ---- horizontal pair on local rows
        if use_pallas:
            vt3 = jnp.transpose(v_rows, (0, 2, 1))  # (D, W, Hs)
            agg3 = sp.sgm_aggregate_scan(
                vt3, jnp.swapaxes(img_rows, 0, 1), P1, P2, True,
                "left" if mask_left else "right", scan_is_x=True, width=W)
            out = acc_vr + jnp.transpose(agg3, (0, 2, 1))
        else:
            vwhd = jnp.moveaxis(jnp.swapaxes(v_rows, 1, 2), 0, -1)  # (W, Hs, D)
            d = jnp.arange(D)[None, None, :]
            x = jnp.arange(W)[:, None, None]
            dm = jnp.broadcast_to((d <= x) if mask_left else (x + d < W),
                                  (W, Hs, D))
            it = jnp.swapaxes(img_rows, 0, 1)
            agg = sgm_mod._scan_direction(vwhd, it, dm, P1, P2, False)
            agg = agg + sgm_mod._scan_direction(vwhd, it, dm, P1, P2, True)
            out = acc_vr + jnp.moveaxis(jnp.swapaxes(agg, 0, 1), -1, 0)
        return out

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P()),
        out_specs=P(None, AXIS, None),
        check_vma=False,
    )
    return f(vol, img)


# --------------------------------------------------------------------------
# Row-sharded SGM: wavefront vertical scans + local horizontal scans
# --------------------------------------------------------------------------


def sharded_semi_global_matching(vol, img, P1, P2, mesh, sd: int = -1,
                                 do_diagonal: bool = False):
    """4/8-path SGM with image rows sharded across the mesh (SURVEY.md §5's
    "ring-attention analogue" for the SGM path axis).

    Horizontal paths live entirely inside a row shard and run locally in
    parallel (n-way speedup). Vertical paths are sequential along the image:
    the scan carry (prev path costs, running best, last intensity) rides a
    ppermute wavefront — shard k continues where shard k-1 stopped, exactly
    reproducing the single-device recurrence. The vertical wavefront is
    column-block pipelined; widths that don't divide the mesh are padded to
    the next block multiple (dead masked lanes, cropped after the loop) so
    the pipeline never silently serializes.

    With ``do_diagonal`` the four diagonal paths of the 8-path extension
    (stereo/sgm.py ``_scan_diagonal``) also ride the wavefront: the two
    down-diagonals continue across shards on the forward permute, the two
    up-diagonals on the reverse. Diagonal paths drift one column per row, so
    they process the full width per shard step (no column-block pipelining)
    — cost is one extra sequential wavefront overlapped with the pipelined
    vertical one.

    On TPU every segment runs the streaming Pallas kernel with the
    cross-shard carry as kernel operands (sgm_pallas.sgm_aggregate_block /
    sgm_aggregate_diag_block), and directions sharing a row orientation
    chain through one aliased accumulator (forward: horizontal seed +
    down-vertical + down-diagonals; reversed: the up directions) — one
    XLA-side volume add total. Shard heights that are not multiples of 8
    still run in-kernel as whole-segment blocks up to 128 rows (VGA over
    8 shards). The virtual CPU test mesh exercises the XLA twins of the
    same wavefront.

    vol is (D, H, W) with H sharded; returns the aggregated (D, H, W)
    volume (H sharded).
    """
    from ..stereo import sgm as sgm_mod

    D, H, W = vol.shape
    n = mesh.devices.size
    assert H % n == 0, "image rows must divide the mesh"
    mask_mode_left = sd < 0

    if n == 1:
        # one shard: every recurrence is local, so the wavefront machinery
        # (zero-init result buffers, row-reversed operands, per-step
        # dynamic slices, post-loop adds) is pure overhead — run the
        # single-device aggregation (in-kernel direction chaining on TPU)
        # under the same mesh/specs. Measured 2.6 -> ~1.5 ms at VGA/64
        # (docs/PERF.md "wavefront overhead model").
        from ..stereo import dispatch as _fast

        f1 = shard_map(
            lambda v, i: _fast.semi_global_matching(
                v, i, P1, P2, do_diagonal=do_diagonal, sd=sd),
            mesh=mesh, in_specs=(P(None, AXIS, None), P(AXIS, None)),
            out_specs=P(None, AXIS, None), check_vma=False,
        )
        return f1(vol, img)

    def local(v_blk, img_blk):
        # v_blk (D, Hs, W) -> (Hs, W, D)
        v = jnp.moveaxis(v_blk.astype(jnp.float32), 0, -1)
        Hs = v.shape[0]
        idx = jax.lax.axis_index(AXIS)
        nsh = jax.lax.axis_size(AXIS)
        d = jnp.arange(D)[None, None, :]
        x = jnp.arange(W)[None, :, None]
        dmask_row = jnp.broadcast_to((d <= x) if mask_mode_left else (x + d < W),
                                     (1, W, D))[0]
        dmask = jnp.broadcast_to(dmask_row[None], (Hs, W, D))

        out = jnp.zeros_like(v)

        # ---- horizontal paths: rows are local to the shard. On TPU the
        # per-shard work runs the streaming Pallas kernel (pallas_call
        # composes with shard_map; shard rows ride the lane axis as the
        # full-array dim); the XLA scan remains the portable path (and the
        # one the virtual CPU test mesh exercises).
        from .. import backend
        from ..stereo import sgm_pallas as sp

        # the vertical wavefront's per-block segments also run the Pallas
        # kernel on TPU (sgm_pallas.sgm_aggregate_block: the cross-shard
        # carry enters/leaves the kernel as (prev, best) operands), in the
        # volume's native (D, Hs, W) layout. Non-multiple-of-8 shard
        # heights up to 128 rows (VGA over 8 shards: Hs = 60) run as one
        # whole-segment block — no silent XLA fallback at production shard
        # counts.
        use_kv = backend.use_pallas(
            Hs % sp.ROWS_PER_STEP == 0 or Hs <= 128)
        out_dhw = None
        hz_xla = False

        if backend.use_pallas(W % sp.ROWS_PER_STEP == 0 or W <= 128):
            vt3 = jnp.transpose(v, (2, 1, 0))  # (D, W, Hs): scan along x
            it = jnp.swapaxes(img_blk, 0, 1)
            agg3 = sp.sgm_aggregate_scan(
                vt3, it, P1, P2, True,
                "left" if mask_mode_left else "right",
                scan_is_x=True, width=W)
            if use_kv:
                out_dhw = jnp.transpose(agg3, (0, 2, 1))  # (D, Hs, W)
            else:
                out = out + jnp.transpose(agg3, (2, 1, 0))
        else:
            vt = jnp.swapaxes(v, 0, 1)  # (W, Hs, D)
            it = jnp.swapaxes(img_blk, 0, 1)
            mt = jnp.swapaxes(dmask, 0, 1)
            agg = sgm_mod._scan_direction(vt, it, mt, P1, P2, reverse=False)
            agg = agg + sgm_mod._scan_direction(vt, it, mt, P1, P2, reverse=True)
            out = out + jnp.swapaxes(agg, 0, 1)
            hz_xla = True

        # ---- vertical wavefronts: column-block pipelined, both directions
        # overlapped. The vertical recurrence is sequential over ROWS, but
        # independent per COLUMN — so shards pipeline over column blocks:
        # shard k processes block (t - k) at step t and passes only that
        # block's carry downstream. With nb = nsh blocks, both directions
        # finish in (2*nsh - 1) block-steps instead of 2*nsh full-shard
        # scans: an ~nsh-fold latency reduction at scale. Columns are
        # padded (masked dead lanes) so every width pipelines.
        nb = n
        Wp = -(-W // nb) * nb
        Wc = Wp // nb
        pad = Wp - W
        if pad:
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
            ip = jnp.pad(img_blk, ((0, 0), (0, pad)))
            mp = jnp.pad(dmask, ((0, 0), (0, pad), (0, 0)))  # False pad
        else:
            vp, ip, mp = v, img_blk, dmask
        Hs_ = v.shape[0]

        def init_carry():
            return (
                jnp.full((Wc, D), 1e30, jnp.float32),
                jnp.zeros((Wc,), jnp.float32),
                jnp.zeros((Wc,), jnp.float32),
            )

        def pipe_step(res, carry, vv, ii, mm, b, seed_shard):
            active = (b >= 0) & (b < nb)
            col0 = jnp.clip(b, 0, nb - 1) * Wc
            blk_v = jax.lax.dynamic_slice(vv, (0, col0, 0), (Hs_, Wc, D))
            blk_i = jax.lax.dynamic_slice(ii, (0, col0), (Hs_, Wc))
            blk_m = jax.lax.dynamic_slice(mm, (0, col0, 0), (Hs_, Wc, D))
            mask_row = blk_m[0]  # d<=x masks are row-independent

            def seed(c):
                lr, fin = sgm_mod._scan_direction(
                    blk_v, blk_i, blk_m, P1, P2, reverse=False,
                    return_carry=True)
                return lr, (fin[0], fin[1], fin[2])

            def cont(c):
                lr, fin = sgm_mod._scan_direction(
                    blk_v, blk_i, blk_m, P1, P2, reverse=False,
                    carry_in=(c[0], c[1], c[2], mask_row), return_carry=True)
                return lr, (fin[0], fin[1], fin[2])

            def skip(c):
                return jnp.zeros((Hs_, Wc, D), v.dtype), c

            lr, new_c = jax.lax.cond(
                active,
                lambda c: jax.lax.cond(seed_shard, seed, cont, c),
                skip,
                carry,
            )
            old_blk = jax.lax.dynamic_slice(res, (0, col0, 0), (Hs_, Wc, D))
            res = jax.lax.dynamic_update_slice(
                res, jnp.where(active, lr, old_blk), (0, col0, 0))
            return res, new_c

        # ---- TPU variant of the block step: the same pipeline, but each
        # block segment is the streaming Pallas kernel with the carry as
        # (prev, best) operands and the upstream last-intensity row folded
        # into p2's first row (interpret-mode equality:
        # tests/test_pallas_kernels.py TestSgmCarrySegments). Each segment
        # ADDS onto the chain's accumulator block in-kernel (the aliased
        # acc operand), so directions sharing an orientation share ONE
        # result buffer and the post-loop XLA adds disappear.
        if use_kv:
            vk0 = v_blk.astype(jnp.float32)
            vk = jnp.pad(vk0, ((0, 0), (0, 0), (0, pad))) if pad else vk0
            ik = ip
            vkr, ikr = vk[:, ::-1], ik[::-1]
            kmode = "left" if mask_mode_left else "right"

            def init_carry_k():
                return (
                    jnp.full((D, Wc), 1e30, jnp.float32),
                    jnp.zeros((Wc,), jnp.float32),
                    jnp.zeros((Wc,), jnp.float32),
                )

            def pipe_step_k(res, carry, vv, ii, b, seed_shard, with_acc):
                """``with_acc`` only when other directions share this
                chain's buffer (a horizontal seed or the diagonals): a
                purely-vertical chain writes each block exactly once, so
                reading the (still zero) accumulator would be pure HBM
                waste."""
                active = (b >= 0) & (b < nb)
                col0 = jnp.clip(b, 0, nb - 1) * Wc
                blk_v = jax.lax.dynamic_slice(vv, (0, 0, col0), (D, Hs_, Wc))
                blk_i = jax.lax.dynamic_slice(ii, (0, col0), (Hs_, Wc))

                def acc_blk():
                    if not with_acc:
                        return None
                    return jax.lax.dynamic_slice(res, (0, 0, col0),
                                                 (D, Hs_, Wc))

                def seed(c):
                    lr, cp, cb, li = sp.sgm_aggregate_block(
                        blk_v, blk_i, P1, P2, kmode, width=W,
                        lane_offset=col0, acc=acc_blk())
                    return lr, (cp, cb, li)

                def cont(c):
                    lr, cp, cb, li = sp.sgm_aggregate_block(
                        blk_v, blk_i, P1, P2, kmode, width=W, seed=False,
                        carry_prev=c[0], carry_best=c[1], last_img=c[2],
                        lane_offset=col0, acc=acc_blk())
                    return lr, (cp, cb, li)

                def skip(c):
                    return jax.lax.dynamic_slice(
                        res, (0, 0, col0), (D, Hs_, Wc)), c

                lr, new_c = jax.lax.cond(
                    active,
                    lambda c: jax.lax.cond(seed_shard, seed, cont, c),
                    skip,
                    carry,
                )
                res = jax.lax.dynamic_update_slice(res, lr, (0, 0, col0))
                return res, new_c

        vvr, iir, mmr = vp[::-1], ip[::-1], mp[::-1]
        permf = [(i, (i + 1) % nsh) for i in range(nsh)]
        permr = [(i, (i - 1) % nsh) for i in range(nsh)]
        steps = nsh + nb - 1

        # ---- diagonal wavefronts (8-path mode): full-width scans, one
        # active shard per direction per step. _scan_diagonal handles fresh
        # starts per-step via its has_prev mask, so the zero init IS the
        # seed carry and seed==continue.
        def diag_init():
            return (
                jnp.full((W, D), 1e30, jnp.float32),
                jnp.zeros((W,), jnp.float32),
                jnp.zeros((W,), jnp.float32),
                jnp.zeros((W,), bool),
            )

        def diag_step(res, carry, vv, ii, mm, active):
            def run(c):
                lr, fin = sgm_mod._scan_diagonal(
                    vv, ii, mm, P1, P2, dx=1, carry_in=c, return_carry=True)
                return lr, fin

            def skip(c):
                return jnp.zeros((Hs_, W, D), v.dtype), c

            lr, new_c = jax.lax.cond(active, run, skip, carry)
            res = jnp.where(active, lr, res)
            return res, new_c

        # the four diagonals: (flip_y, flip_x). flip_x is purely local
        # (columns are not sharded); flip_y reverses both local rows and the
        # shard order (seed at the last shard, carry on the reverse permute).
        # On TPU (use_kv) each segment runs the Pallas kernel
        # (sgm_aggregate_diag_block) with dx=+-1 passed directly instead of
        # an x-flip, so the kernel's internally derived absolute-x disparity
        # mask stays valid; the XLA carry's has-path mask rides along, making
        # the zero init the seed carry exactly like the XLA twin.
        diag_arrays = []
        diag_specs = []
        if do_diagonal and use_kv:
            def diag_init_k():
                return (
                    jnp.full((D, Wp), 1e30, jnp.float32),
                    jnp.zeros((Wp,), jnp.float32),
                    jnp.zeros((Wp,), jnp.float32),
                    jnp.zeros((Wp,), jnp.float32),
                )

            def diag_step_k(res, carry, vv, ii, dxv, active):
                def run(arg):
                    c, r = arg
                    lr, cp, cb, li, ch = sp.sgm_aggregate_diag_block(
                        vv, ii, c[0], c[1], c[3], c[2], P1, P2, kmode,
                        dx=dxv, width=W, acc=r)
                    return lr, (cp, cb, li, ch)

                def skip(arg):
                    c, r = arg
                    return r, c

                res, new_c = jax.lax.cond(active, run, skip, (carry, res))
                return res, new_c

            diag_specs = [(dxv, flip_y) for flip_y in (False, True)
                          for dxv in (1, -1)]
        elif do_diagonal:
            for flip_y in (False, True):
                for flip_x in (False, True):
                    vv = v[::-1] if flip_y else v
                    ii = img_blk[::-1] if flip_y else img_blk
                    mm = dmask[::-1] if flip_y else dmask
                    if flip_x:
                        vv, ii, mm = vv[:, ::-1], ii[:, ::-1], mm[:, ::-1]
                    diag_arrays.append((vv, ii, mm, flip_y, flip_x))

        if use_kv:
            # ---- two orientation-chained accumulators: the horizontal
            # result seeds the forward chain; the down-vertical and both
            # down-diagonals add onto it in-kernel, the up directions onto
            # the row-reversed chain — the only XLA-side volume op left is
            # one final add (+ the row flip). Diagonals run on the PADDED
            # lane block so the buffers coincide; the kernel's
            # predecessor-inside-width clamp keeps pad lanes from leaking
            # into lane W-1 under dx=-1.
            if out_dhw is not None:
                zf = (jnp.pad(out_dhw, ((0, 0), (0, 0), (0, pad)))
                      if pad else out_dhw)
            else:
                zf = jnp.zeros((D, Hs_, Wp), jnp.float32)
            fwd_acc = (out_dhw is not None) or do_diagonal
            rev_acc = do_diagonal

            def loop_body_k(t, state):
                res_fwd, res_rev, cf, cr, dcar = state
                res_fwd, cf = pipe_step_k(res_fwd, cf, vk, ik,
                                          t - idx, idx == 0, fwd_acc)
                res_rev, cr = pipe_step_k(res_rev, cr, vkr, ikr,
                                          t - (nsh - 1 - idx),
                                          idx == nsh - 1, rev_acc)
                # the post-final-step permute is dead data, but keeps the
                # loop body uniform so it traces/compiles once
                cf = tuple(jax.lax.ppermute(x, AXIS, permf) for x in cf)
                cr = tuple(jax.lax.ppermute(x, AXIS, permr) for x in cr)
                dcar2 = []
                for (dxv, flip_y), c0 in zip(diag_specs, dcar):
                    active = ((t == (nsh - 1 - idx)) if flip_y
                              else (t == idx))
                    if flip_y:
                        res_rev, c1 = diag_step_k(res_rev, c0, vkr, ikr,
                                                  dxv, active)
                    else:
                        res_fwd, c1 = diag_step_k(res_fwd, c0, vk, ik,
                                                  dxv, active)
                    perm = permr if flip_y else permf
                    c1 = tuple(jax.lax.ppermute(y, AXIS, perm) for y in c1)
                    dcar2.append(c1)
                return res_fwd, res_rev, cf, cr, tuple(dcar2)

            res_fwd, res_rev, _, _, _ = jax.lax.fori_loop(
                0, steps, loop_body_k,
                (zf, jnp.zeros((D, Hs_, Wp), jnp.float32),
                 init_carry_k(), init_carry_k(),
                 tuple(diag_init_k() for _ in diag_specs)),
            )
            ret = (res_fwd + res_rev[:, ::-1])[:, :, :W]
            if hz_xla:
                ret = ret + jnp.moveaxis(out, -1, 0)
            return ret

        def loop_body(t, state):
            res_f, res_r, cf, cr, dres, dcar = state
            res_f, cf = pipe_step(res_f, cf, vp, ip, mp,
                                  t - idx, idx == 0)
            res_r, cr = pipe_step(res_r, cr, vvr, iir, mmr,
                                  t - (nsh - 1 - idx), idx == nsh - 1)
            # the post-final-step permute is dead data, but keeps the loop
            # body uniform so it traces/compiles once
            cf = tuple(jax.lax.ppermute(x, AXIS, permf) for x in cf)
            cr = tuple(jax.lax.ppermute(x, AXIS, permr) for x in cr)
            dres2, dcar2 = [], []
            for (vv, ii, mm, flip_y, _), r0, c0 in zip(diag_arrays, dres,
                                                       dcar):
                active = (t == (nsh - 1 - idx)) if flip_y else (t == idx)
                r1, c1 = diag_step(r0, c0, vv, ii, mm, active)
                perm = permr if flip_y else permf
                c1 = tuple(jax.lax.ppermute(y, AXIS, perm) for y in c1)
                dres2.append(r1)
                dcar2.append(c1)
            return res_f, res_r, cf, cr, tuple(dres2), tuple(dcar2)

        z0 = jnp.zeros((Hs_, Wp, D), v.dtype)
        res_f, res_r, _, _, dres, _ = jax.lax.fori_loop(
            0, steps, loop_body,
            (z0, jnp.zeros_like(z0), init_carry(), init_carry(),
             tuple(jnp.zeros_like(v) for _ in diag_arrays),
             tuple(diag_init() for _ in diag_arrays)),
        )
        out = out + res_f[:, :W] + res_r[::-1][:, :W]
        for (_, _, _, flip_y, flip_x), r in zip(diag_arrays, dres):
            if flip_x:
                r = r[:, ::-1]
            if flip_y:
                r = r[::-1]
            out = out + r
        return jnp.moveaxis(out, -1, 0)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None)),
        out_specs=P(None, AXIS, None),
        check_vma=False,
    )
    return f(vol, img)


# --------------------------------------------------------------------------
# Row-sharded SGM tail: WTA + medians + LR check without replication
# --------------------------------------------------------------------------


def sharded_sgm_tail(agg, mesh, max_disp: int, *, subpix: bool = True,
                     lr_check: bool = True, max_disp_diff=1.0,
                     median_its: int = 1, median_max_bad: int = 12):
    """Post-aggregation SGM tail on a ROW-SHARDED aggregated volume
    (stereo2/main.cpp:429-455: WTA [subpix] -> medians both sides -> LR
    check both ways, with the right side re-anchored from the left volume).

    Previously the app replicated the aggregated volume (one full-volume
    all_gather over ICI) because the tail's Pallas kernels are opaque to
    the SPMD partitioner; every tail stage is in fact row-local — WTA and
    the parabola refinement reduce over D per pixel, the right re-anchor
    ``aggR[d,y,x] = aggL[d,y,x+d]`` and the LR checks only move along x —
    except the 5x5 medians, which exchange a 2-row halo per iteration
    (``halo_exchange_rows``; edge replication matches the median's
    ``mode="edge"`` padding, so interior AND border shards are bit-equal
    to the single-device stages). Inside each shard the stages are the
    same ``stereo.dispatch`` kernels as the single-chip pipeline.

    ``agg`` is (D, H, W) with H sharded over ``mesh``; returns the final
    left disparity, row-sharded (H, W) — all_gathering that image is ~1000x
    cheaper than gathering the volume.
    """
    from ..stereo import dispatch as fast

    def _median(d):
        padded = halo_exchange_rows(d, 2)
        out = fast.median_filter_reject_invalid(padded, median_max_bad, rad=2)
        return out[2:-2]

    def local(agg_block):
        if subpix:
            disp_l = fast.cost_vol_minimum_subpix(agg_block, -1)
        else:
            disp_l = cv.cost_vol_minimum(agg_block, max_disp).astype(
                jnp.float32)
        disp_r = None
        if lr_check:
            agg_r = cv.reanchor_right(agg_block)
            if subpix:
                disp_r = fast.cost_vol_minimum_subpix(agg_r, 1)
            else:
                disp_r = cv.cost_vol_minimum(agg_r, max_disp).astype(
                    jnp.float32)
        for _ in range(median_its):
            disp_l = _median(disp_l)
            if lr_check:
                disp_r = _median(disp_r)
        if lr_check:
            disp_r = fast.left_right_check(disp_r, disp_l, 1, max_disp_diff,
                                           max_disp=max_disp)
            disp_l = fast.left_right_check(disp_l, disp_r, -1, max_disp_diff,
                                           max_disp=max_disp)
        return disp_l

    f = shard_map(
        local, mesh=mesh,
        in_specs=P(None, AXIS, None),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return f(agg)
