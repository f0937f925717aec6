"""Gather-free TSDF fusion and raycasting via plane-sweep factorization.

TPU-native redesign of SdfFuse (cu_sdffusion.cu:16-61) and RaycastSdf
(cu_raycast.cu:34-113). The CUDA kernels gather: fusion samples the depth
image at every voxel's projection and raycasting samples the volume along
every ray — and scalar gathers are the measured bottleneck on TPU
(~8.6 ns/element through XLA; docs/PERF.md). This module removes the
gathers entirely with a shear-scale-warp factorization (the perspective
variant of Lacroute & Levoy's shear-warp):

For voxel plane k the projection (i, j) -> (u, v) is the homography
``H_k = A + k * e @ [0,0,1]`` with ``A = K [R_cw[:,0] sx, R_cw[:,1] sy,
R_cw lo + t]`` and ``e = K R_cw[:,2] sz``. Then with ``g = A^-1 e``::

    H_k = A  @  S_k,     S_k(i, j) = ((i + k g0) / (1 + k g2),
                                      (j + k g1) / (1 + k g2))

i.e. every per-plane homography is one FIXED per-frame homography ``A``
composed with a per-plane uniform SCALE + TRANSLATE. So:

* fuse: warp the (depth, costheta, valid) image ONCE by ``A`` onto an
  intermediate (t, s) grid, then each voxel plane is two banded
  interpolation matmuls (MXU) of that grid — no per-voxel gathers.
* raycast: each volume z-plane resamples onto the same (t, s) grid with
  two banded matmuls; in (t, s) space every ray is a vertical line, so
  the surface crossing is an elementwise scan over k; one final
  image-sized warp maps (t, s) results back to pixels.

costheta needs no per-voxel data: ``dot(n(u,v), P_c)/-|P_c|`` only uses
the DIRECTION of P_c, which is the pixel ray — an image-space quantity.

Deviations from the reference (documented in docs/PARITY.md): sampling is
bilinear-on-the-warped-grid instead of bilinear-at-the-exact-projection
(sub-intermediate-pixel difference); any invalid bilinear tap invalidates
the fuse sample (the reference's NaN poisoning, carried by a -1e6 depth
sentinel instead of a separate validity channel); raycast reads unobserved
voxels as +trunc (the reference's SdfReset state) with the volume boundary
masked analytically; planes through the camera centre (|1 + k g2| ~ 0) are
skipped.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..containers.volume import TsdfVolume
from ..core import sampling, se3


class SweepGeom(NamedTuple):
    """Per-frame plane-sweep factorization (all traced values)."""

    A: jnp.ndarray        # (3, 3) fixed homography (t,s grid -> pixels)
    Ainv: jnp.ndarray     # (3, 3)
    e: jnp.ndarray        # (3,) per-plane offset column
    g: jnp.ndarray        # (3,) A^-1 e
    s_lo: jnp.ndarray     # scalar: s value of grid column 0
    ds: jnp.ndarray       # scalar: s per grid column
    t_lo: jnp.ndarray     # scalar
    dt: jnp.ndarray       # scalar


# Sweep-axis tables: the volume can sweep along world z (axis 0, the
# default), y (1) or x (2) — pick the one most parallel to the view so the
# per-plane homographies stay well-conditioned (a plane parallel to the view
# direction projects to a line: A goes singular and crossings are missed).
# order = world axes playing the (i, j, k) roles; perm transposes the
# (D, H, W) = [z, y, x] volume array into [k, j, i] layout.
_ORDER = {0: (0, 1, 2), 1: (0, 2, 1), 2: (1, 2, 0)}

# Depth sentinel for invalid pixels in the fuse warp: any bilinear tap
# with nonzero weight drives sd below every plausible -trunc (lerp weights
# below 1e-6 snap to zero in _lerp_weight, so there is no tiny-weight band
# where the sentinel corrupts without rejecting).
_INVALID_DEPTH = -1e6
_PERM = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}
_INV_PERM = {0: (0, 1, 2), 1: (1, 0, 2), 2: (1, 2, 0)}


def _zero_ct(x):
    """Zero cotangent matching x's primal type (float0 for int/bool)."""
    import numpy as _np

    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return _np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _windowed_fori_vjp(win_conv, full_conv, args, wconsts, fconsts):
    state, b_lo, b_hi = args
    return win_conv(state, b_lo, b_hi, *wconsts)


def _wf_fwd(win_conv, full_conv, args, wconsts, fconsts):
    state, b_lo, b_hi = args
    return win_conv(state, b_lo, b_hi, *wconsts), (args, wconsts, fconsts)


def _wf_bwd(win_conv, full_conv, res, ct):
    args, wconsts, fconsts = res
    _, vjp = jax.vjp(lambda a, c: full_conv(a[0], a[1], a[2], *c),
                     args, fconsts)
    ga, gf = vjp(ct)
    # wconsts and fconsts reference the same upstream values; the full
    # twin's vjp already carries the total derivative, so the wconsts slot
    # contributes zero
    return ga, tuple(map(_zero_ct, wconsts)), gf


_windowed_fori_vjp.defvjp(_wf_fwd, _wf_bwd)


def _windowed_fori(b_lo, b_hi, nb: int, body, state):
    """``lax.fori_loop(b_lo, b_hi, body, state)`` with DYNAMIC bounds, made
    reverse-differentiable.

    JAX has no reverse rule for dynamic-bound fori_loops, which would make
    the frustum plane windows forward-only. The fix: the forward pass runs
    the dynamic window (cost scales with the window, unchanged); under
    ``jax.grad`` the backward pass differentiates a STATIC-trip-count twin
    whose body masks out-of-window batches with ``jnp.where`` — exactly
    equal for any window, so the gradient is exact for the primal computed.
    ``jax.closure_convert`` hoists the body's closed-over tracers (the
    warped grid, homography parts, ...) into explicit vjp inputs so their
    gradients flow too.
    """

    def windowed(state, lo, hi):
        return jax.lax.fori_loop(lo, hi, body, state)

    def full(state, lo, hi):
        def gated(b, s):
            out = body(b, s)
            in_win = (b >= lo) & (b < hi)
            return jax.tree_util.tree_map(
                lambda o, x: jnp.where(in_win, o, x), out, s)

        return jax.lax.fori_loop(0, nb, gated, state)

    win_conv, wconsts = jax.closure_convert(windowed, state, b_lo, b_hi)
    full_conv, fconsts = jax.closure_convert(full, state, b_lo, b_hi)
    return _windowed_fori_vjp(win_conv, full_conv, (state, b_lo, b_hi),
                              tuple(wconsts), tuple(fconsts))


def _world_steps(vol: TsdfVolume):
    """World units per voxel index along (x, y, z)."""
    D, Hv, Wv = vol.val.shape
    n = jnp.array([Wv - 1, Hv - 1, D - 1], jnp.float32)
    return vol.bbox.size() / n


def _homography_parts(vol: TsdfVolume, T_cw, K, order=(0, 1, 2)):
    """A, e of the voxel-index -> pixel projection (see module docstring).
    ``order`` = world axes playing the (i, j, k) roles."""
    T_cw = jnp.asarray(T_cw)
    R = T_cw[:, :3]
    t = T_cw[:, 3]
    step = _world_steps(vol)  # (sx, sy, sz) world units per index
    Km = jnp.asarray(K.matrix())
    oi, oj, ok = order
    A = Km @ jnp.stack(
        [R[:, oi] * step[oi], R[:, oj] * step[oj], R @ vol.bbox.lo + t], axis=1
    )
    e = Km @ (R[:, ok] * step[ok])
    return A, e


def _plane_scales(g, k):
    """(denom, s-offset, t-offset) of S_k: s=(i + k g0)/denom, etc."""
    denom = 1.0 + k * g[2]
    return denom, k * g[0], k * g[1]


def _image_preimage_range(Ainv, Wi, Hi, axis: int):
    """Range of s (axis=0) or t (axis=1) covered by the image under A^-1;
    (+-inf) when the horizon crosses the image (preimage unbounded)."""
    corners = jnp.array(
        [[-2.0, -2.0, 1.0], [Wi + 1.0, -2.0, 1.0],
         [-2.0, Hi + 1.0, 1.0], [Wi + 1.0, Hi + 1.0, 1.0]],
        jnp.float32,
    )
    q = corners @ Ainv.T  # (4, 3)
    w = q[:, 2]
    consistent = jnp.all(w > 1e-9) | jnp.all(w < -1e-9)
    vals = q[:, axis] / jnp.where(jnp.abs(w) < 1e-12, jnp.nan, w)
    lo = jnp.where(consistent, jnp.nanmin(vals), -jnp.inf)
    hi = jnp.where(consistent, jnp.nanmax(vals), jnp.inf)
    return lo, hi


def _plane_intervals(Ainv, g, n_i, n_j, Wi, Hi, D: int):
    """Per-plane (s, t) footprint intervals — S_k(voxel rect) clipped to the
    image preimage under A — and the per-plane emptiness flag. A plane with
    an empty clipped interval on either axis has NO voxel projecting into
    the image: the frustum-visibility predicate behind both the grid window
    (make_sweep_geom) and the dynamic plane window (frustum-ROI fusion, the
    reference's SubBoundingVolume crop, kinectfusion/main.cpp:345-357)."""
    k = jnp.arange(D, dtype=jnp.float32)
    denom, off_s, off_t = _plane_scales(g, k)
    ok = jnp.abs(denom) > 1e-6
    safe = jnp.where(ok, denom, 1.0)

    def axis_iv(n_idx, off, img_axis):
        a = off / safe
        b = (n_idx - 1.0 + off) / safe
        lo_k = jnp.minimum(a, b)
        hi_k = jnp.maximum(a, b)
        img_lo, img_hi = _image_preimage_range(Ainv, Wi, Hi, img_axis)
        lo_k = jnp.maximum(lo_k, img_lo)
        hi_k = jnp.minimum(hi_k, img_hi)
        empty = (~ok) | (lo_k > hi_k)
        return lo_k, hi_k, empty

    s_lo_k, s_hi_k, s_empty = axis_iv(n_i, off_s, 0)
    t_lo_k, t_hi_k, t_empty = axis_iv(n_j, off_t, 1)
    return (s_lo_k, s_hi_k, s_empty), (t_lo_k, t_hi_k, t_empty)


def make_sweep_geom(vol: TsdfVolume, T_cw, K, Wi: int, Hi: int,
                    grid_w: int, grid_h: int, from_planes: bool = True,
                    order=(0, 1, 2)) -> SweepGeom:
    """Build the factorization + an intermediate grid window that covers the
    useful (s, t) region: the union over planes of S_k(voxel rect), clipped
    to the preimage of the image rect under A (samples outside the image
    are invalid anyway)."""
    A, e = _homography_parts(vol, T_cw, K, order)
    Ainv = jnp.linalg.inv(A)
    g = Ainv @ e
    counts = vol.val.shape[::-1]  # voxel counts along world (x, y, z)
    n_i, n_j, D = counts[order[0]], counts[order[1]], counts[order[2]]

    (s_lo_k, s_hi_k, s_empty), (t_lo_k, t_hi_k, t_empty) = _plane_intervals(
        Ainv, g, n_i, n_j, Wi, Hi, D)

    def axis_range(n_idx, lo_k, hi_k, empty):
        lo = jnp.min(jnp.where(empty, jnp.inf, lo_k))
        hi = jnp.max(jnp.where(empty, -jnp.inf, hi_k))
        # all planes empty (frame misses the volume): any finite window
        bad = ~(jnp.isfinite(lo) & jnp.isfinite(hi) & (lo < hi))
        lo = jnp.where(bad, 0.0, lo)
        hi = jnp.where(bad, jnp.float32(n_idx - 1.0), hi)
        return lo, hi

    # the grid window covers the union of plane footprints clipped to the
    # image preimage — correct for both fuse (plane samples) and raycast
    # (pixels outside it miss every plane)
    del from_planes
    s_lo, s_hi = axis_range(n_i, s_lo_k, s_hi_k, s_empty)
    t_lo, t_hi = axis_range(n_j, t_lo_k, t_hi_k, t_empty)
    ds = (s_hi - s_lo) / (grid_w - 1)
    dt = (t_hi - t_lo) / (grid_h - 1)
    return SweepGeom(A, Ainv, e, g, s_lo, ds, t_lo, dt)


def _grid_st(geom: SweepGeom, grid_w: int, grid_h: int):
    s = geom.s_lo + geom.ds * jnp.arange(grid_w, dtype=jnp.float32)
    t = geom.t_lo + geom.dt * jnp.arange(grid_h, dtype=jnp.float32)
    return s, t


def _grid_uv(geom: SweepGeom, s, t):
    """Pixel coordinates of every (t, s) grid point under A (broadcasts
    (t rows, s cols))."""
    A = geom.A
    S = s[None, :]
    T = t[:, None]
    den = A[2, 0] * S + A[2, 1] * T + A[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-12, jnp.nan, den)
    u = (A[0, 0] * S + A[0, 1] * T + A[0, 2]) / den
    v = (A[1, 0] * S + A[1, 1] * T + A[1, 2]) / den
    return u, v


def _lerp_weight(d):
    """Two-tap lerp weight with sub-1e-6 weights snapped to zero: against
    the fuse's -1e6 invalid-depth sentinel, a tap weight in (0, 1e-7)
    would corrupt the sample by up to ~trunc while still passing the
    (sd > -trunc) gate; snapping costs <=1e-6 of interpolation accuracy
    and removes the band entirely."""
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.where(w > 1e-6, w, 0.0)


def _lerp_matrix(pos, n_in: int):
    """(len(pos), n_in) banded linear-interpolation matrix: row p has the
    two-tap lerp weights for sample position pos[p]; positions outside
    [0, n_in-1] get all-zero rows (-> validity 0)."""
    idx = jnp.arange(n_in, dtype=jnp.float32)[None, :]
    return _lerp_weight(pos[:, None] - idx)


def _lerp_matrix_batch(pos, n_in: int):
    """Batched _lerp_matrix: pos (P, M) -> (P, M, n_in)."""
    idx = jnp.arange(n_in, dtype=jnp.float32)[None, None, :]
    return _lerp_weight(pos[..., None] - idx)


# ---------------------------------------------------------------------------
# Fusion
# ---------------------------------------------------------------------------


def _visible_planes(geom: SweepGeom, depth, valid_img, D: int, n_i: int,
                    n_j: int, Wi: int, Hi: int, trunc_dist, mincostheta,
                    near=None, far=None):
    """Per-plane visibility mask of the frustum-clipped fuse (see the window
    comment in _sdf_fuse_axis): footprint emptiness + the bit-equal
    measured-depth bound + the optional near/far ROI crop."""
    A, g = geom.A, geom.g
    (s_lo_k, s_hi_k, s_empty), (t_lo_k, t_hi_k, t_empty) = _plane_intervals(
        geom.Ainv, g, n_i, n_j, Wi, Hi, D)
    ksf = jnp.arange(D, dtype=jnp.float32)
    denom_k = 1.0 + ksf * g[2]
    qz_c = jnp.stack([
        denom_k * (A[2, 0] * sc + A[2, 1] * tc + A[2, 2])
        for sc in (s_lo_k, s_hi_k) for tc in (t_lo_k, t_hi_k)
    ])  # (4, D): qz is linear over the footprint rect -> corner extremes
    qz_ok = jnp.all(jnp.isfinite(qz_c), axis=0)
    qz_min = jnp.min(qz_c, axis=0)
    qz_max = jnp.max(qz_c, axis=0)
    dmax = jnp.max(jnp.where(valid_img, depth, -jnp.inf))
    far_bound = jnp.maximum(dmax, 0.0) + trunc_dist / mincostheta
    visible = ~(s_empty | t_empty) & ~(qz_ok & (qz_min > far_bound))
    if near is not None:
        visible &= ~(qz_ok & (qz_max < near))
    if far is not None:
        visible &= ~(qz_ok & (qz_min > far))
    return visible


def fuse_plane_window(vol: TsdfVolume, depth, normals, T_cw, K, trunc_dist,
                      mincostheta=0.1, sweep_axis: int = 0, near=None,
                      far=None, grid_w: int | None = None,
                      grid_h: int | None = None):
    """Diagnostic: the (D,) visible-plane mask the frustum-clipped fuse will
    sweep for this frame (sdf_fuse_separable ``clip_planes``). Useful for
    tests and for profiling how the ROI window tracks the camera."""
    order, perm = _ORDER[sweep_axis], _PERM[sweep_axis]
    Hi, Wi = depth.shape
    grid_w = grid_w or Wi
    grid_h = grid_h or Hi
    val_p = vol.val.transpose(perm)
    D, Hv, Wv = val_p.shape
    geom = make_sweep_geom(vol, T_cw, K, Wi, Hi, grid_w, grid_h, order=order)
    ray = jnp.asarray(K.unproject_grid(Wi, Hi))
    ct_img = (jnp.sum(normals[..., :3] * ray, axis=-1)
              / -jnp.linalg.norm(ray, axis=-1))
    valid_img = jnp.isfinite(depth) & jnp.isfinite(ct_img)
    return _visible_planes(geom, depth, valid_img, D, Wv, Hv, Wi, Hi,
                           trunc_dist, mincostheta, near, far)


def _blend(old_val, old_w, new_sd, w_new, max_w):
    """SDF_t::operator+= then LimitWeight (Sdf.h:25-32), first-observation
    guard as in sdf.sdf_fuse. Voxels with no update (w_new == 0) pass
    through bit-exactly — the reference only invokes += under its guard."""
    old_val_safe = jnp.where(old_w > 0, old_val, 0.0)
    w_tot = old_w + w_new
    val = jnp.where(
        w_tot > 0,
        (old_w * old_val_safe + w_new * new_sd) / jnp.maximum(w_tot, 1e-20),
        old_val,
    )
    val = jnp.where(w_new > 0, val, old_val)
    return val, jnp.minimum(w_tot, max_w)


def _view_axis_index(T_cw):
    """Sweep-axis choice: dominant world component of the camera's optical
    axis (row 2 of R_cw) -> 0 for z-sweep, 1 for y, 2 for x."""
    view = jnp.abs(jnp.asarray(T_cw)[2, :3])
    return jnp.argmax(jnp.stack([view[2], view[1], view[0]]))


@functools.partial(
    jax.jit,
    static_argnames=("grid_w", "grid_h", "warp", "sweep_axis", "clip_planes",
                     "gather_bits"))
def sdf_fuse_separable(vol: TsdfVolume, depth, normals, T_cw, K, trunc_dist,
                       max_w=1000.0, mincostheta=0.1,
                       grid_w: int | None = None,
                       grid_h: int | None = None,
                       warp: str = "nearest",
                       sweep_axis: int | str = "auto",
                       enable=None, clip_planes: bool = True,
                       near=None, far=None,
                       gather_bits: bool = True) -> TsdfVolume:
    """SdfFuse (cu_sdffusion.cu:16-61) with zero per-voxel gathers.

    One warp of the (depth, costheta, valid) image onto the intermediate
    grid (image-sized: the only gather, ~Wi*Hi samples), then per voxel
    plane two banded interpolation matmuls on the MXU plus elementwise TSDF
    math. See the module docstring for the factorization. ``sweep_axis``
    picks which voxel axis the planes sweep (0=z, 1=y, 2=x); 'auto'
    selects the axis most parallel to the view at trace time via
    ``lax.switch`` (a plane parallel to the view projects to a line and
    its homography degenerates).

    ``enable`` (optional traced bool) gates the whole update inside the
    plane loop: when False the volume passes through unchanged. Callers
    that would otherwise jnp.where-select full volumes afterwards (the
    frame step's tracking gate) save two volume-sized selects.

    ``clip_planes`` (default on) restricts the sweep to the dynamic window
    of camera-visible planes — the reference's frustum-ROI crop
    (kinectfusion/main.cpp:345-357, BoundedVolume.h:138): fuse cost scales
    with the visible slab fraction, bit-equal to the full sweep (footprint
    + measured-depth criteria; see the window comment in _sdf_fuse_axis).
    ``near``/``far`` additionally crop planes outside that camera-depth
    interval — the reference app's knear/kfar ROI sliders
    (kinectfusion/main.cpp:86-87, 345), a semantic crop like the
    reference's, NOT bit-equal to the uncropped fuse.
    """
    if sweep_axis == "auto":
        idx = _view_axis_index(T_cw)
        return jax.lax.switch(
            idx,
            [lambda _, a=a: _sdf_fuse_axis(
                vol, depth, normals, T_cw, K, trunc_dist, max_w, mincostheta,
                grid_w, grid_h, warp, a, enable=enable,
                clip_planes=clip_planes, near=near, far=far,
                gather_bits=gather_bits)
             for a in (0, 1, 2)],
            None,
        )
    return _sdf_fuse_axis(vol, depth, normals, T_cw, K, trunc_dist, max_w,
                          mincostheta, grid_w, grid_h, warp, sweep_axis,
                          enable=enable, clip_planes=clip_planes,
                          near=near, far=far, gather_bits=gather_bits)


def _sdf_fuse_axis(vol, depth, normals, T_cw, K, trunc_dist, max_w,
                   mincostheta, grid_w, grid_h, warp, axis: int,
                   color=None, img=None, T_iw=None, K_img=None, enable=None,
                   clip_planes: bool = True, near=None, far=None,
                   gather_bits: bool = True):
    order, perm, inv_perm = _ORDER[axis], _PERM[axis], _INV_PERM[axis]
    Hi, Wi = depth.shape
    grid_w = grid_w or Wi
    grid_h = grid_h or Hi
    val_p = vol.val.transpose(perm)
    wgt_p = vol.weight.transpose(perm)
    color_p = color.transpose(perm) if color is not None else None
    D, Hv, Wv = val_p.shape

    geom = make_sweep_geom(vol, T_cw, K, Wi, Hi, grid_w, grid_h, order=order)
    s, t = _grid_st(geom, grid_w, grid_h)
    u, v = _grid_uv(geom, s, t)

    # image-space costheta: dot(n, P_c)/-|P_c| uses only the ray direction
    ray = jnp.asarray(K.unproject_grid(Wi, Hi))
    ct_img = jnp.sum(normals[..., :3] * ray, axis=-1) / -jnp.linalg.norm(ray, axis=-1)
    valid_img = jnp.isfinite(depth) & jnp.isfinite(ct_img)
    # invalid pixels carry a -BIG depth sentinel instead of a third validity
    # channel: any invalid bilinear tap drags the sampled depth hugely
    # negative, so sd = ct*(md - qz) fails the (sd > -trunc) test exactly
    # where the old (val_frac > 0.999) gate rejected — one less channel
    # through the per-plane matmuls.
    packed = jnp.stack(
        [jnp.where(valid_img, depth, _INVALID_DEPTH),
         jnp.where(valid_img, ct_img, 0.0)],
        axis=-1,
    )

    # the ONE gather: warp the packed image onto the (t, s) grid.
    # Nearest-neighbour: the validity channel stays exactly {0, 1}, so the
    # only invalid-spread is the per-plane bilinear pass — the same spread
    # the reference's bilinear-at-the-projection has. (A bilinear stage-1
    # double-spreads validity and costs 4x the gathers for a sub-half-pixel
    # accuracy gain.)
    uv_ok = sampling.in_bounds(depth, u, v, 0) & jnp.isfinite(u) & jnp.isfinite(v)
    if warp == "bilinear":
        G = sampling.bilinear(packed, jnp.where(uv_ok, u, 0.0),
                              jnp.where(uv_ok, v, 0.0))
    else:
        ui = jnp.clip(jnp.floor(jnp.where(uv_ok, u, 0.0) + 0.5), 0, Wi - 1)
        vi = jnp.clip(jnp.floor(jnp.where(uv_ok, v, 0.0) + 0.5), 0, Hi - 1)
        # 16-bit-halves gather: bit-exact, ~1.6x the f32[N, 2] take
        flat = packed.reshape(-1, 2)
        G = sampling.take_f32(flat, (vi * Wi + ui).astype(jnp.int32),
                              bits=gather_bits)
    invalid_px = jnp.array([_INVALID_DEPTH, 0.0], jnp.float32)
    G = jnp.where(uv_ok[..., None], G, invalid_px)  # (grid_h, grid_w, 2)

    A, g = geom.A, geom.g
    iv = jnp.arange(Wv, dtype=jnp.float32)
    jv = jnp.arange(Hv, dtype=jnp.float32)
    ks = jnp.arange(D, dtype=jnp.float32)
    denom_all, offs_all, offt_all = _plane_scales(g, ks)

    # optional colour camera: its OWN factorization over the same planes
    # (cu_sdffusion.cu:70-138 projects each voxel into a second camera)
    if color_p is not None:
        Hc, Wc = img.shape[:2]
        grey_img = jnp.mean(img.astype(jnp.float32), axis=-1) / 255.0
        geom2 = make_sweep_geom(vol, T_iw, K_img, Wc, Hc, grid_w, grid_h,
                                order=order)
        s2, t2 = _grid_st(geom2, grid_w, grid_h)
        u2, v2 = _grid_uv(geom2, s2, t2)
        ok2 = (sampling.in_bounds(grey_img, u2, v2, 0)
               & jnp.isfinite(u2) & jnp.isfinite(v2))
        ui2 = jnp.clip(jnp.floor(jnp.where(ok2, u2, 0.0) + 0.5), 0, Wc - 1)
        vi2 = jnp.clip(jnp.floor(jnp.where(ok2, v2, 0.0) + 0.5), 0, Hc - 1)
        packed2 = jnp.stack(
            [grey_img, jnp.ones_like(grey_img)], axis=-1).reshape(-1, 2)
        G2 = sampling.take_f32(packed2, (vi2 * Wc + ui2).astype(jnp.int32),
                               bits=gather_bits)
        G2 = jnp.where(ok2[..., None], G2, 0.0)
        G2m = G2.reshape(grid_h, grid_w * 2)
        A2, g2 = geom2.A, geom2.g
        denom2_all, offs2_all, offt2_all = _plane_scales(g2, ks)
    else:
        G2m = A2 = g2 = None
        denom2_all = offs2_all = offt2_all = jnp.zeros_like(denom_all)

    # batch P planes per scan step: the interpolation matmuls become
    # (P*Hv, gh) @ (gh, gw*2) — MXU-sized instead of per-plane slivers
    P = next(p for p in (8, 4, 2, 1) if D % p == 0)

    if color_p is None:
        import os

        from .. import backend

        if (backend.use_pallas() and os.environ.get("KANGAROO_PALLAS_FUSE")
                and near is None and far is None):
            # VMEM-resident plane loop (separable_pallas.py). Measured
            # bit-identical and NOT faster than the XLA scan (2.52 vs
            # 2.48 ms at 256^3/VGA — the scan already runs at the matmul
            # compute floor and XLA overlaps its slab staging), while the
            # first device-side Mosaic compile takes ~20 min. Opt-in only.
            # Skipping the clip_planes window here is safe (the window is
            # bit-equal to the full sweep), but near/far genuinely crop —
            # the kernel has no plane window, so fall through to the XLA
            # twin whenever they are set to keep the engines identical.
            from . import separable_pallas as sp

            en = (jnp.float32(1.0) if enable is None
                  else jnp.asarray(enable).astype(jnp.float32))
            params = jnp.concatenate([
                A.reshape(-1).astype(jnp.float32),
                g.astype(jnp.float32),
                jnp.stack([geom.s_lo, geom.ds, geom.t_lo, geom.dt]
                          ).astype(jnp.float32),
                jnp.stack([jnp.float32(trunc_dist), jnp.float32(max_w),
                           jnp.float32(mincostheta), en]),
            ])
            val, weight = sp.fuse_planes_pallas(
                val_p, wgt_p, G[..., 0], G[..., 1], params, P, Wi, Hi)
            return TsdfVolume(val.transpose(inv_perm),
                              weight.transpose(inv_perm), vol.bbox)

    Gm = G.reshape(grid_h, grid_w * 2)

    def batch_update(old_val, old_w, old_col, denom, off_s, off_t, dn2, os2, ot2):
        plane_ok = jnp.abs(denom) > 1e-6
        dsafe = jnp.where(plane_ok, denom, 1.0)
        s_of_i = (iv[None, :] + off_s[:, None]) / dsafe[:, None]  # (P, Wv)
        t_of_j = (jv[None, :] + off_t[:, None]) / dsafe[:, None]  # (P, Hv)
        si = (s_of_i - geom.s_lo) / geom.ds
        tj = (t_of_j - geom.t_lo) / geom.dt
        Ck = _lerp_matrix_batch(si, grid_w)
        Rk = _lerp_matrix_batch(tj, grid_h)
        # voxels whose lerp position falls off the grid window get partial/
        # zero-weight rows — mask them analytically (this replaces the old
        # explicit validity-fraction channel)
        win_ok = ((tj >= 0.0) & (tj <= grid_h - 1.0))[:, :, None] & (
            (si >= 0.0) & (si <= grid_w - 1.0))[:, None, :]  # (P, Hv, Wv)
        # pass 1: one big matmul over the stacked plane rows
        tmp = (Rk.reshape(P * Hv, grid_h) @ Gm).reshape(P, Hv, grid_w, 2)
        # pass 2: one batched einsum per channel — transposing channels onto
        # the contraction rows instead costs 2.5-6x (XLA materialises the
        # (..., gw, C) -> (..., C, gw) transpose per scan step)
        md = jnp.einsum("phs,pis->phi", tmp[..., 0], Ck,
                        preferred_element_type=jnp.float32)
        ct = jnp.einsum("phs,pis->phi", tmp[..., 1], Ck,
                        preferred_element_type=jnp.float32)

        # elementwise TSDF math (identical to the reference kernel)
        S = s_of_i[:, None, :]                   # (P, 1, Wv)
        T = t_of_j[:, :, None]                   # (P, Hv, 1)
        den_uv = A[2, 0] * S + A[2, 1] * T + A[2, 2]
        qz = dsafe[:, None, None] * den_uv       # camera depth of the voxel
        den_uv = jnp.where(jnp.abs(den_uv) < 1e-12, jnp.nan, den_uv)
        uu = (A[0, 0] * S + A[0, 1] * T + A[0, 2]) / den_uv
        vv = (A[1, 0] * S + A[1, 1] * T + A[1, 2]) / den_uv
        in_img = sampling.in_bounds(depth, uu, vv, 2)

        sd = ct * (md - qz)
        w = ct / qz
        update = (
            plane_ok[:, None, None]
            & in_img
            & win_ok
            & (sd > -trunc_dist)
            & jnp.isfinite(md)
            & jnp.isfinite(w)
            & (ct > mincostheta)
        )
        if enable is not None:
            update = update & enable

        if color_p is not None:
            p2_ok = jnp.abs(dn2) > 1e-6
            d2safe = jnp.where(p2_ok, dn2, 1.0)
            s2_of_i = (iv[None, :] + os2[:, None]) / d2safe[:, None]
            t2_of_j = (jv[None, :] + ot2[:, None]) / d2safe[:, None]
            Ck2 = _lerp_matrix_batch((s2_of_i - geom2.s_lo) / geom2.ds, grid_w)
            Rk2 = _lerp_matrix_batch((t2_of_j - geom2.t_lo) / geom2.dt, grid_h)
            tmpc = (Rk2.reshape(P * Hv, grid_h) @ G2m).reshape(P, Hv, grid_w, 2)
            grey = jnp.einsum("phs,pis->phi", tmpc[..., 0], Ck2,
                              preferred_element_type=jnp.float32)
            grey_ok = jnp.einsum("phs,pis->phi", tmpc[..., 1], Ck2,
                                 preferred_element_type=jnp.float32)
            Sc = s2_of_i[:, None, :]
            Tc = t2_of_j[:, :, None]
            denc = A2[2, 0] * Sc + A2[2, 1] * Tc + A2[2, 2]
            denc = jnp.where(jnp.abs(denc) < 1e-12, jnp.nan, denc)
            uc = (A2[0, 0] * Sc + A2[0, 1] * Tc + A2[0, 2]) / denc
            vc = (A2[1, 0] * Sc + A2[1, 1] * Tc + A2[1, 2]) / denc
            in_c = sampling.in_bounds(grey_img, uc, vc, 2)
            update = update & p2_ok[:, None, None] & in_c & (grey_ok > 0.999)

        new_sd = jnp.where(update, jnp.clip(sd, -trunc_dist, trunc_dist), 0.0)
        w_new = jnp.where(update, w, 0.0)
        val, w_tot = _blend(old_val, old_w, new_sd, w_new, max_w)

        if color_p is not None:
            # grey blend over the old weight (cu_sdffusion.cu:116-124)
            colour = jnp.where(
                update,
                (w_new * grey + old_col * old_w)
                / jnp.maximum(w_new + old_w, 1e-20),
                old_col,
            )
        else:
            colour = old_col
        return val, w_tot, colour

    col_in = color_p if color_p is not None else jnp.zeros((D, 1, 1), jnp.float32)

    def batch_body(b, state):
        val_f, w_f, col_f = state
        k0 = b * P
        old_val = jax.lax.dynamic_slice(val_f, (k0, 0, 0), (P, Hv, Wv))
        old_w = jax.lax.dynamic_slice(w_f, (k0, 0, 0), (P, Hv, Wv))
        old_col = jax.lax.dynamic_slice(
            col_f, (k0, 0, 0), (P,) + col_f.shape[1:])
        args = tuple(
            jax.lax.dynamic_slice(a, (k0,), (P,))
            for a in (denom_all, offs_all, offt_all,
                      denom2_all, offs2_all, offt2_all))
        val, w_tot, colour = batch_update(old_val, old_w, old_col, *args)
        val_f = jax.lax.dynamic_update_slice(val_f, val, (k0, 0, 0))
        w_f = jax.lax.dynamic_update_slice(w_f, w_tot, (k0, 0, 0))
        if color_p is not None:
            col_f = jax.lax.dynamic_update_slice(col_f, colour, (k0, 0, 0))
        return val_f, w_f, col_f

    # Frustum plane window (the reference's per-frame ROI crop:
    # kinectfusion/main.cpp:345-357 builds BoundingBox(T_wl, w, h, K, knear,
    # kfar) and fuses vol.SubBoundingVolume(roi) only). The batch loop runs
    # ONLY the visible plane batches, so fuse cost scales with the visible
    # slab fraction. Two bit-equal criteria (skipped planes provably have
    # all-false update masks) plus the reference's explicit near/far crop:
    #
    #  1. footprint: a plane whose (s, t) interval clipped to the image
    #     preimage is empty has no voxel projecting into the image;
    #  2. depth: the update gate sd > -trunc means qz < md + trunc/ct
    #     <= max(valid depth) + trunc/mincostheta — planes whose NEAREST
    #     footprint depth exceeds that bound can never update. qz =
    #     denom_k * h2(s, t) is linear over the footprint rect, so its
    #     range comes from the four corners.
    #  3. (opt-in, NOT bit-equal — it is the reference app's knear/kfar ROI
    #     semantics) planes entirely outside [near, far] camera depth.
    if clip_planes:
        visible = _visible_planes(geom, depth, valid_img, D, Wv, Hv, Wi, Hi,
                                  trunc_dist, mincostheta, near, far)
        any_vis = jnp.any(visible)
        k_lo = jnp.argmax(visible).astype(jnp.int32)
        k_hi = (D - 1 - jnp.argmax(visible[::-1])).astype(jnp.int32)
        b_lo = jnp.where(any_vis, k_lo // P, 0)
        b_hi = jnp.where(any_vis, k_hi // P + 1, 0)
        # dynamic window, reverse-differentiable via the static twin
        val, weight, colour = _windowed_fori(
            b_lo, b_hi, D // P, batch_body, (val_p, wgt_p, col_in))
    else:
        val, weight, colour = jax.lax.fori_loop(
            0, D // P, batch_body, (val_p, wgt_p, col_in))
    out_vol = TsdfVolume(
        val.transpose(inv_perm), weight.transpose(inv_perm), vol.bbox)
    if color_p is None:
        return out_vol
    return out_vol, colour.transpose(inv_perm)


@functools.partial(
    jax.jit,
    static_argnames=("grid_w", "grid_h", "warp", "sweep_axis", "clip_planes",
                     "gather_bits"))
def sdf_fuse_color_separable(vol: TsdfVolume, color_vol, depth, normals,
                             T_cw, K, img, T_iw, K_img, trunc_dist,
                             max_w=1000.0, mincostheta=0.1,
                             grid_w: int | None = None,
                             grid_h: int | None = None,
                             warp: str = "nearest",
                             sweep_axis: int | str = "auto",
                             enable=None, clip_planes: bool = True,
                             near=None, far=None,
                             gather_bits: bool = True):
    """Colour-fusing SdfFuse (cu_sdffusion.cu:70-138) on the plane-sweep
    engine: the colour camera gets its own shear-scale-warp factorization
    over the same voxel planes, so the grey sample is two more banded
    matmuls per plane instead of a per-voxel gather. ``color_vol`` is a
    BoundedVolume of grey in [0,1]; img is (Hc, Wc, 3). Returns
    (TsdfVolume, BoundedVolume). ``enable``/``near``/``far`` behave as in
    :func:`sdf_fuse_separable` (one update mask gates both volumes)."""
    from ..containers.volume import BoundedVolume

    def run(a):
        out = _sdf_fuse_axis(vol, depth, normals, T_cw, K, trunc_dist,
                             max_w, mincostheta, grid_w, grid_h, warp, a,
                             color=color_vol.data, img=img, T_iw=T_iw,
                             K_img=K_img, enable=enable,
                             clip_planes=clip_planes, near=near, far=far,
                             gather_bits=gather_bits)
        v, col = out
        return v, BoundedVolume(col, color_vol.bbox)

    if sweep_axis == "auto":
        idx = _view_axis_index(T_cw)
        return jax.lax.switch(
            idx, [lambda _, a=a: run(a) for a in (0, 1, 2)], None)
    return run(sweep_axis)


# ---------------------------------------------------------------------------
# Raycast
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "grid_w", "grid_h", "shade", "normals",
                     "sweep_axis", "output", "clip_planes", "gather_bits"))
def raycast_sdf_separable(vol: TsdfVolume, T_wc, K, w: int, h: int,
                          near=0.1, far=10.0, trunc_dist=None,
                          grid_w: int | None = None, grid_h: int | None = None,
                          shade: bool = True, normals: str = "depth",
                          sweep_axis: int | str = "auto",
                          output: str = "pixels", clip_planes: bool = True,
                          gather_bits: bool = True):
    """RaycastSdf (cu_raycast.cu:34-113) as a gather-free plane sweep.

    Every volume z-plane resamples onto the intermediate (t, s) grid with
    two banded matmuls; in that space each ray is one (t, s) column, so the
    zero-crossing search is an elementwise scan over k with linear depth
    interpolation at the crossing (the reference's subpix mode). One final
    image-sized warp maps results to pixels.

    ``normals``: 'depth' (default, fastest) derives normals from the
    raycast depth map (NormalsFromVbo, cu_normals.cu:12-45 — the app-level
    alternative); 'gradient' reproduces the reference's volume-gradient
    normals via finite differences of the swept slabs transformed through
    the sweep Jacobian, at ~1.5x the sweep cost.

    ``sweep_axis`` (0=z, 1=y, 2=x, 'auto') selects the plane orientation:
    rays nearly parallel to the sweep planes miss crossings, so 'auto'
    picks the axis most parallel to the view via ``lax.switch``.
    Returns (depth, normals(h,w,4), img) like raycast_sdf.

    ``output='cloud'`` skips the final pixel warp (an image-sized NN gather
    — 2.2 ms at VGA, the sweep's single most expensive op) and returns the
    model as a camera-space point cloud ON THE SWEEP GRID:
    (depth (gh, gw), vbo (gh, gw, 4), normals (gh, gw, 4)). Each grid node
    lies on an exact camera ray, so projective ICP consumes it directly —
    the reference's frame loop only ever feeds the raycast to ICP
    (kinectfusion/main.cpp:280-311), which does not care that the model
    points sit on a reparametrised lattice.
    """
    if sweep_axis == "auto":
        T_cw = se3.inverse(jnp.asarray(T_wc))
        idx = _view_axis_index(T_cw)
        return jax.lax.switch(
            idx,
            [lambda _, a=a: _raycast_axis(
                vol, T_wc, K, w, h, near, far, trunc_dist, grid_w, grid_h,
                shade, normals, a, output, clip_planes, gather_bits)
             for a in (0, 1, 2)],
            None,
        )
    return _raycast_axis(vol, T_wc, K, w, h, near, far, trunc_dist, grid_w,
                         grid_h, shade, normals, sweep_axis, output,
                         clip_planes, gather_bits)


def _raycast_axis(vol, T_wc, K, w, h, near, far, trunc_dist, grid_w, grid_h,
                  shade, normals, axis: int, output: str = "pixels",
                  clip_planes: bool = True, gather_bits: bool = True):
    order, perm = _ORDER[axis], _PERM[axis]
    grad_normals = normals == "gradient"
    grid_w = grid_w or w
    grid_h = grid_h or h
    val_p = vol.val.transpose(perm)
    wgt_p = vol.weight.transpose(perm)
    D, Hv, Wv = val_p.shape
    T_cw = se3.inverse(jnp.asarray(T_wc))
    geom = make_sweep_geom(vol, T_cw, K, w, h, grid_w, grid_h, order=order)
    A, Ainv, g = geom.A, geom.Ainv, geom.g
    s, t = _grid_st(geom, grid_w, grid_h)
    steps_w = _world_steps(vol)
    voxel = (steps_w[order[0]], steps_w[order[1]], steps_w[order[2]])
    if trunc_dist is None:
        trunc_dist = 2.0 * voxel[0]

    # base camera depth of each (t, s) ray at k=0 scale: qz_k = denom_k * h2
    h2 = A[2, 0] * s[None, :] + A[2, 1] * t[:, None] + A[2, 2]  # (gh, gw)

    ks = jnp.arange(D, dtype=jnp.float32)
    denom_all, offs_all, offt_all = _plane_scales(g, ks)

    # Unobserved voxels read as +trunc — exactly the reference's SdfReset
    # state that its trilinear tracer marches through (cu_raycast.cu:66,
    # cu_sdffusion.cu:144-169) — so no separate validity channel rides the
    # per-plane matmuls; the volume/grid-window boundary is masked
    # analytically in the plane loop instead.
    val_ok = jnp.isfinite(val_p) & (wgt_p > 0)
    packed = jnp.where(val_ok, val_p, trunc_dist)  # (D, Hv, Wv) sweep layout

    # ray direction: ascending k moves away from the camera iff qz grows
    # with k: dqz/dk = g2 * h2 (h2 > 0 for forward rays)
    ascending = (g[2] * h2 >= 0) | (g[2] == 0)

    class Carry(NamedTuple):
        prev_val: jnp.ndarray
        prev_ok: jnp.ndarray
        prev_qz: jnp.ndarray
        # first crossing walking k upward (for ascending rays)
        asc_depth: jnp.ndarray
        asc_found: jnp.ndarray
        asc_n: jnp.ndarray
        # last crossing of the reversed orientation (first for descending)
        dsc_depth: jnp.ndarray
        dsc_n: jnp.ndarray
        dsc_found: jnp.ndarray

    zero = jnp.zeros((grid_h, grid_w), jnp.float32)
    zero3 = (jnp.zeros((grid_h, grid_w, 3), jnp.float32) if grad_normals
             else jnp.zeros((1, 1, 3), jnp.float32))
    fal = jnp.zeros((grid_h, grid_w), bool)
    init = Carry(zero, fal, zero, zero, fal, zero3, zero, zero3, fal)

    inv_ds = 1.0 / geom.ds
    inv_dt = 1.0 / geom.dt
    # batch P planes per scan step (MXU-sized matmuls, see sdf_fuse_separable)
    P = next(p for p in (8, 4, 2, 1) if D % p == 0)

    def _resample(vplanes, denom, off_s, off_t):
        """Two banded matmuls + analytic masks: (val, in_range, qz) slabs
        plus the raw pieces the gradient-normal path needs."""
        plane_ok = jnp.abs(denom) > 1e-6
        # voxel coords of each grid point on each plane
        i_of_s = s[None, :] * denom[:, None] - off_s[:, None]   # (P, gw)
        j_of_t = t[None, :] * denom[:, None] - off_t[:, None]   # (P, gh)
        Ck = _lerp_matrix_batch(i_of_s, Wv)                     # (P, gw, Wv)
        Rk = _lerp_matrix_batch(j_of_t, Hv)                     # (P, gh, Hv)
        tmp = jnp.einsum("pgj,pji->pgi", Rk, vplanes,
                         preferred_element_type=jnp.float32)
        val = jnp.einsum("pgi,psi->pgs", tmp, Ck,
                         preferred_element_type=jnp.float32)    # (P, gh, gw)
        # analytic volume-rect mask replaces the old validity channel:
        # grid points whose lerp position falls outside the voxel rect get
        # partial/zero-weight rows and must not produce crossings
        ok = (plane_ok[:, None, None]
              & ((j_of_t >= 0.0) & (j_of_t <= Hv - 1.0))[:, :, None]
              & ((i_of_s >= 0.0) & (i_of_s <= Wv - 1.0))[:, None, :])
        qz = denom[:, None, None] * h2
        in_range = ok & (qz > near) & (qz < far)
        return val, in_range, qz, plane_ok

    def planes(c: Carry, xs):
        vplanes, denom, off_s, off_t = xs  # (P, Hv, Wv), (P,)
        val, in_range, qz, plane_ok = _resample(vplanes, denom, off_s, off_t)

        prev_val = jnp.concatenate([c.prev_val[None], val[:-1]], axis=0)
        prev_ok = jnp.concatenate([c.prev_ok[None], in_range[:-1]], axis=0)
        prev_qz = jnp.concatenate([c.prev_qz[None], qz[:-1]], axis=0)

        if grad_normals:
            # volume gradient via sweep-space finite differences
            D_s = (jnp.roll(val, -1, axis=2) - jnp.roll(val, 1, axis=2)) * (0.5 * inv_ds)
            D_t = (jnp.roll(val, -1, axis=1) - jnp.roll(val, 1, axis=1)) * (0.5 * inv_dt)
            dsafe = jnp.where(plane_ok, denom, 1.0)[:, None, None]
            vol_i = D_s / dsafe
            vol_j = D_t / dsafe
            dk_val = val - prev_val
            di_dk = s[None, None, :] * g[2] - g[0]
            dj_dk = t[None, :, None] * g[2] - g[1]
            vol_k = dk_val - vol_i * di_dk - vol_j * dj_dk
            # scatter the (i, j, k)-role derivatives back to world (x, y, z)
            comps = {order[0]: vol_i / voxel[0], order[1]: vol_j / voxel[1],
                     order[2]: vol_k / voxel[2]}
            n_w = jnp.stack([comps[0], comps[1], comps[2]], axis=-1)

        crossing = in_range & prev_ok & (prev_val > 0) & (val <= 0)
        # double-where guard: non-crossing lanes can hold inf/NaN qz from
        # degenerate planes; a multiply whose saved residual is non-finite
        # turns the zero cotangent into NaN in reverse mode (0 * inf), so
        # both factors are masked BEFORE the product, not just the result
        lam = jnp.where(crossing, prev_val, 0.0) / jnp.maximum(
            jnp.where(crossing, prev_val - val, 1.0), 1e-20)
        qz_hit = (jnp.where(crossing, prev_qz, 0.0)
                  + jnp.where(crossing, qz - prev_qz, 0.0) * lam)

        # first crossing in the batch (ascending rays), none before it and
        # none in earlier batches
        prior = jnp.cumsum(crossing, axis=0) - crossing.astype(jnp.int32)
        first = crossing & (prior == 0) & ~c.asc_found
        asc_depth = c.asc_depth + jnp.sum(jnp.where(first, qz_hit, 0.0), axis=0)
        asc_found = c.asc_found | jnp.any(crossing, axis=0)

        # last reverse crossing in the batch (descending rays overwrite)
        rcross = in_range & prev_ok & (val > 0) & (prev_val <= 0)
        rlam = jnp.where(rcross, val, 0.0) / jnp.maximum(
            jnp.where(rcross, val - prev_val, 1.0), 1e-20)
        rqz_hit = (jnp.where(rcross, qz, 0.0)
                   + jnp.where(rcross, prev_qz - qz, 0.0) * rlam)
        later = (jnp.cumsum(rcross[::-1], axis=0)[::-1] - rcross.astype(jnp.int32))
        last = rcross & (later == 0)
        any_r = jnp.any(rcross, axis=0)
        dsc_depth = jnp.where(any_r, jnp.sum(jnp.where(last, rqz_hit, 0.0), axis=0),
                              c.dsc_depth)
        dsc_found = c.dsc_found | any_r

        if grad_normals:
            asc_n = c.asc_n + jnp.sum(jnp.where(first[..., None], n_w, 0.0), axis=0)
            dsc_n = jnp.where(any_r[..., None],
                              jnp.sum(jnp.where(last[..., None], n_w, 0.0), axis=0),
                              c.dsc_n)
        else:
            asc_n, dsc_n = c.asc_n, c.dsc_n

        return Carry(val[-1], in_range[-1], qz[-1], asc_depth, asc_found,
                     asc_n, dsc_depth, dsc_n, dsc_found), None

    xs = (
        packed.reshape(D // P, P, Hv, Wv),
        denom_all.reshape(D // P, P),
        offs_all.reshape(D // P, P),
        offt_all.reshape(D // P, P),
    )

    if grad_normals:
        c, _ = jax.lax.scan(planes, init, xs)
        found = jnp.where(ascending, c.asc_found, c.dsc_found)
        qz_hit = jnp.where(ascending, c.asc_depth, c.dsc_depth)
    else:
        # Almost every frame has a uniform ray orientation (h2 only changes
        # sign when the sweep horizon crosses the grid window), so the
        # common case runs a single-orientation sweep with half the
        # crossing bookkeeping; descending frames flip the plane order,
        # which makes the first-crossing-in-scan-order semantics (and the
        # interpolation formulas, bit-exactly) equal to the dual scan's
        # reverse path. Mixed frames fall back to the dual scan.
        class CarryS(NamedTuple):
            prev_val: jnp.ndarray
            prev_ok: jnp.ndarray
            prev_qz: jnp.ndarray
            depth: jnp.ndarray
            found: jnp.ndarray

        def planes_single(c: CarryS, xs_k):
            vplanes, denom, off_s, off_t = xs_k
            val, in_range, qz, _ = _resample(vplanes, denom, off_s, off_t)
            prev_val = jnp.concatenate([c.prev_val[None], val[:-1]], axis=0)
            prev_ok = jnp.concatenate([c.prev_ok[None], in_range[:-1]], axis=0)
            prev_qz = jnp.concatenate([c.prev_qz[None], qz[:-1]], axis=0)
            crossing = in_range & prev_ok & (prev_val > 0) & (val <= 0)
            # double-where guard against 0 * inf in reverse mode (see the
            # dual-scan body above)
            lam = jnp.where(crossing, prev_val, 0.0) / jnp.maximum(
                jnp.where(crossing, prev_val - val, 1.0), 1e-20)
            qz_hit = (jnp.where(crossing, prev_qz, 0.0)
                      + jnp.where(crossing, qz - prev_qz, 0.0) * lam)
            prior = jnp.cumsum(crossing, axis=0) - crossing.astype(jnp.int32)
            first = crossing & (prior == 0) & ~c.found
            depth = c.depth + jnp.sum(jnp.where(first, qz_hit, 0.0), axis=0)
            found = c.found | jnp.any(crossing, axis=0)
            return CarryS(val[-1], in_range[-1], qz[-1], depth, found), None

        all_asc = jnp.all(ascending)
        uniform = all_asc | jnp.all(~ascending)

        # Frustum plane window (mirrors the fuse's clip_planes): a plane
        # whose clipped footprint is empty, or whose camera-depth range
        # misses [near, far] entirely, has in_range all-False — it can
        # produce no crossing and never flips prev_ok True, so skipping
        # it is bit-equal. Raycast cost then scales with the depth window
        # instead of the volume extent.
        (s_lo_k, s_hi_k, s_empty), (t_lo_k, t_hi_k, t_empty) = \
            _plane_intervals(Ainv, g, Wv, Hv, w, h, D)
        qz_c = jnp.stack([
            denom_all * (A[2, 0] * sc + A[2, 1] * tc + A[2, 2])
            for sc in (s_lo_k, s_hi_k) for tc in (t_lo_k, t_hi_k)
        ])
        qz_ok = jnp.all(jnp.isfinite(qz_c), axis=0)
        qz_lo = jnp.min(qz_c, axis=0)
        qz_hi = jnp.max(qz_c, axis=0)
        visible = ~(s_empty | t_empty) & ~(
            qz_ok & ((qz_hi < near) | (qz_lo > far)))
        # a crossing needs val <= 0 at a grid sample, and every sample is a
        # nonnegative-weight combination of plane taps (non-observed taps
        # read +trunc > 0) — so planes with NO non-positive tap can host no
        # crossing, and only their immediate neighbours matter as the
        # prev-plane of one. The sweep clips to the observed-negative
        # shell +-1 plane: for a fused front surface that is a thin slab
        # of the volume (one cheap (D,) reduction buys it).
        has_neg = jnp.any(packed <= 0, axis=(1, 2))
        any_neg = jnp.any(has_neg)
        kneg_lo = jnp.argmax(has_neg).astype(jnp.int32) - 1
        kneg_hi = (D - jnp.argmax(has_neg[::-1])).astype(jnp.int32)
        vis_lo = jnp.argmax(visible).astype(jnp.int32)
        vis_hi = (D - 1 - jnp.argmax(visible[::-1])).astype(jnp.int32)
        k_lo = jnp.clip(jnp.maximum(vis_lo, kneg_lo), 0, D - 1)
        k_hi = jnp.clip(jnp.minimum(vis_hi, kneg_hi), 0, D - 1)
        any_vis = jnp.any(visible) & any_neg & (k_lo <= k_hi)

        def run_single(pk, dn, osf, otf, win_rev: bool):
            # windowed batch loop: only visible plane batches are swept.
            # win_rev marks that pk is the k-reversed volume, so the
            # visible window maps to [D-1-k_hi, D-1-k_lo].
            def body(b, cs):
                k0 = b * P
                xs_b = (
                    jax.lax.dynamic_slice(pk, (k0, 0, 0), (P, Hv, Wv)),
                    jax.lax.dynamic_slice(dn, (k0,), (P,)),
                    jax.lax.dynamic_slice(osf, (k0,), (P,)),
                    jax.lax.dynamic_slice(otf, (k0,), (P,)),
                )
                cs, _ = planes_single(cs, xs_b)
                return cs

            init = CarryS(zero, fal, zero, zero, fal)
            if not clip_planes:
                cs = jax.lax.fori_loop(0, D // P, body, init)
                return cs.depth, cs.found
            if win_rev:
                b_lo = jnp.where(any_vis, (D - 1 - k_hi) // P, 0)
                b_hi = jnp.where(any_vis, (D - 1 - k_lo) // P + 1, 0)
            else:
                b_lo = jnp.where(any_vis, k_lo // P, 0)
                b_hi = jnp.where(any_vis, k_hi // P + 1, 0)
            # dynamic window, reverse-differentiable via the static twin
            cs = _windowed_fori(b_lo, b_hi, D // P, body, init)
            return cs.depth, cs.found

        def uniform_case(_):
            # nested cond so the common ascending frame never materialises
            # the reversed volume (a where-select here cost two volume
            # passes every raycast)
            return jax.lax.cond(
                all_asc,
                lambda _: run_single(packed, denom_all, offs_all, offt_all,
                                     win_rev=False),
                lambda _: run_single(packed[::-1], denom_all[::-1],
                                     offs_all[::-1], offt_all[::-1],
                                     win_rev=True),
                None,
            )

        def mixed_case(_):
            c, _ = jax.lax.scan(planes, init, xs)
            return (jnp.where(ascending, c.asc_depth, c.dsc_depth),
                    jnp.where(ascending, c.asc_found, c.dsc_found))

        qz_hit, found = jax.lax.cond(uniform, uniform_case, mixed_case, None)

    if output == "cloud":
        # camera-space model cloud on the sweep grid — no pixel warp.
        # Each grid node (t, s) maps through A to a pixel position (u, v),
        # i.e. an exact camera ray; its hit is P_c = qz * unproject(u, v).
        from ..geometry import depth as depth_mod

        assert not grad_normals, "cloud output uses depth-derived normals"
        u, v = _grid_uv(geom, s, t)
        ok = found & jnp.isfinite(u) & jnp.isfinite(v)
        depth_g = jnp.where(ok, qz_hit, jnp.nan)
        dirx = (u - K.u0) / K.fu
        diry = (v - K.v0) / K.fv
        vbo = jnp.stack([dirx * depth_g, diry * depth_g, depth_g,
                         jnp.ones_like(depth_g)], axis=-1)
        return depth_g, vbo, depth_mod.normals_from_vbo(vbo)

    # ---- final warp: sample the (t, s) results at each pixel's (s, t)
    vv, uu = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    den = Ainv[2, 0] * uu + Ainv[2, 1] * vv + Ainv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-12, jnp.nan, den)
    s_px = (Ainv[0, 0] * uu + Ainv[0, 1] * vv + Ainv[0, 2]) / den
    t_px = (Ainv[1, 0] * uu + Ainv[1, 1] * vv + Ainv[1, 2]) / den
    gs = (s_px - geom.s_lo) / geom.ds
    gt = (t_px - geom.t_lo) / geom.dt
    gi = jnp.clip(jnp.floor(gs + 0.5), 0, grid_w - 1).astype(jnp.int32)
    gj = jnp.clip(jnp.floor(gt + 0.5), 0, grid_h - 1).astype(jnp.int32)
    inb = (gs > -0.5) & (gs < grid_w - 0.5) & (gt > -0.5) & (gt < grid_h - 0.5)
    flat_idx = gj * grid_w + gi

    if grad_normals:
        n_w = jnp.where(ascending[..., None], c.asc_n, c.dsc_n)
        len_n = jnp.linalg.norm(n_w, axis=-1, keepdims=True)
        n_w = jnp.where(len_n > 0, n_w / jnp.maximum(len_n, 1e-20),
                        jnp.array([0.0, 0.0, 1.0]))
        # gradient points from negative (inside) to positive (outside); flip
        # to face the camera like the reference's normalized backward-diff
        view_w = se3.rotate(jnp.asarray(T_wc), jnp.array([0.0, 0.0, 1.0]))
        n_w = jnp.where(jnp.sum(n_w * view_w, axis=-1, keepdims=True) > 0,
                        -n_w, n_w)
        out_pack = jnp.concatenate(
            [qz_hit[..., None], n_w,
             found.astype(jnp.float32)[..., None]], axis=-1
        ).reshape(-1, 5)
        got = sampling.take_f32(out_pack, flat_idx, bits=gather_bits)
        hit = inb & (got[..., 4] > 0.5)
        depth = jnp.where(hit, got[..., 0], jnp.nan)
        n_c = se3.rotate_inv(jnp.asarray(T_wc), got[..., 1:4])
    else:
        # one single-channel take; normals from the depth image like the
        # app-level NormalsFromVbo path (cu_normals.cu:12-45)
        from ..geometry import depth as depth_mod

        # 16-bit-halves gather: bit-exact, 2.7x the f32 take (sampling.py)
        d_pack = jnp.where(found, qz_hit, jnp.nan).reshape(-1)
        got_d = sampling.take_f32(d_pack, flat_idx, bits=gather_bits)
        hit = inb & jnp.isfinite(got_d)
        depth = jnp.where(hit, got_d, jnp.nan)
        vbo = depth_mod.depth_to_vbo(depth, K)
        n4 = depth_mod.normals_from_vbo(vbo)
        n_c = jnp.where(jnp.isfinite(n4[..., :3]), n4[..., :3], 0.0)
    norm_out = jnp.where(
        hit[..., None],
        jnp.concatenate([n_c, jnp.ones((h, w, 1), jnp.float32)], axis=-1),
        0.0,
    )
    if shade:
        from .raycast import phong_shade

        ray_c = jnp.asarray(K.unproject_grid(w, h))
        p_c = jnp.where(hit, depth, 0.0)[..., None] * ray_c
        img = jnp.where(hit, phong_shade(p_c, n_c), 0.0)
    else:
        img = jnp.zeros((h, w), jnp.float32)
    return depth, norm_out, img
