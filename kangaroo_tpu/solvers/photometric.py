"""Photometric (direct) pose-refinement system builders.

TPU-native equivalent of the photometric Gauss-Newton builders in
src/cu_model_refinement.cu: BuildPoseRefinementFromDepthmapSystem (:42-95,
used by PoseRefinementFromVbo :356-385 and PoseRefinementFromDisparity
:387-418) and the forward-compositional ESM variant
BuildPoseRefinementFromDepthmapSystemESM (:97-223, used by
PoseRefinementFromDepthESM :458-493 and PoseRefinementFromDisparityESM
:420-455).

Residual: y = I_live(pi(K T_lr P_r)) - I_ref(u, v); Jacobian via image
gradient x projection derivative x SE3 generators; Tukey IRLS weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import reweighting, sampling, se3
from .lss import LSS, reduce_system


def _proj_jacobian_rows(dI, KP, KT, P):
    """Common Jacobian: J_i = dI * dpi(KP) * KT * gen_i(P).

    dI: (..., 2) image gradient at the projected point; KP: (..., 3) the
    homogeneous projection; KT: (3, 4); P: (..., 3) the pre-transform point.
    Returns (..., 6).
    """
    z = KP[..., 2]
    # dIldPlKT = dI * [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]] * KT  (:62-68)
    a = dI[..., 0] / z
    b = dI[..., 1] / z
    cterm = -(dI[..., 0] * KP[..., 0] + dI[..., 1] * KP[..., 1]) / (z * z)
    # row vector v = [a, b, c] (1x3); v' = v @ KT (1x4), we need first 3 cols
    v = jnp.stack([a, b, cterm], axis=-1)
    vKT = v @ KT[:, :3]  # (..., 3): the translation part of v @ KT[:, :4]
    # Sparse J: translations = vKT; rotations from gen products (:70-77)
    x, y_, zz = P[..., 0], P[..., 1], P[..., 2]
    J3 = -vKT[..., 1] * zz + vKT[..., 2] * y_
    J4 = vKT[..., 0] * zz - vKT[..., 2] * x
    J5 = -vKT[..., 0] * y_ + vKT[..., 1] * x
    return jnp.concatenate([vKT, jnp.stack([J3, J4, J5], axis=-1)], axis=-1)


@jax.jit
def pose_refinement_from_points(img_live, img_ref, points_ref, KT_lr, c) -> LSS:
    """Photometric GN system from a reference point image
    (PoseRefinementFromVbo, cu_model_refinement.cu:356-385; builder :42-95).

    img_live/img_ref: (H, W) grayscale; points_ref: (H, W, 4) points in the
    reference frame; KT_lr: (3, 4) = K * T_lr; c: Tukey constant (on
    intensity difference).
    """
    H, W = img_ref.shape
    Pr = points_ref[..., :3]
    KPl = Pr @ KT_lr[:, :3].T + KT_lr[:, 3]
    pu = KPl[..., 0] / KPl[..., 2]
    pv = KPl[..., 1] / KPl[..., 2]
    in_img = sampling.in_bounds(img_live, pu, pv, 2)
    Il = sampling.bilinear(img_live, pu, pv)
    Ir = img_ref.astype(jnp.float32)
    y = Il - Ir
    dIx, dIy = sampling.central_diff_bilinear(img_live, pu, pv)
    dI = jnp.stack([dIx, dIy], axis=-1)
    J = _proj_jacobian_rows(dI, KPl, KT_lr, Pr)
    valid = jnp.isfinite(Pr[..., 2]) & in_img & jnp.isfinite(y)
    w = reweighting.weight_tukey(y, c)
    return reduce_system(J, y, w, valid)


def pose_refinement_from_disparity(img_live, img_ref, disp_ref, KT_lr, c,
                                   baseline, K, min_disp=16.0) -> LSS:
    """PoseRefinementFromDisparity (cu_model_refinement.cu:387-418): points
    from disparity, then the same builder."""
    from ..geometry.depth import depth_from_disparity_vbo

    points = depth_from_disparity_vbo(disp_ref, K, baseline, min_disp)
    return pose_refinement_from_points(img_live, img_ref, points, KT_lr, c)


@jax.jit
def pose_refinement_from_depth_esm(
    img_live, img_ref, depth_ref, Klg, Krg, Krd, Tgd, Tlr, KlgTlr, c,
    discard_saturated: bool = False, min_depth=0.2, max_depth=20.0,
) -> LSS:
    """Forward-compositional ESM photometric system from a reference depth map
    (PoseRefinementFromDepthESM, cu_model_refinement.cu:458-493; builder
    :97-223).

    Klg/Krg/Krd: (3, 3) intrinsics of live-grey, ref-grey, ref-depth cameras;
    Tgd: (4, 4) ref-depth -> ref-grey; Tlr: (4, 4) ref-grey -> live-grey;
    KlgTlr: (3, 4) = Klg * Tlr[:3]. Both images are sampled bilinearly; the
    Jacobian is the forward-compositional one (the reference's ESM average is
    commented out, :179-211 — we match what it actually computes).
    """
    H, W = depth_ref.shape
    depth = depth_ref.astype(jnp.float32)
    v, u = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    # 3d point in ref depth camera (:106-111)
    Pr_d = jnp.stack(
        [
            depth * (u - Krd[0, 2]) / Krd[0, 0],
            depth * (v - Krd[1, 2]) / Krd[1, 1],
            depth,
            jnp.ones_like(depth),
        ],
        axis=-1,
    )
    Pr_g = Pr_d @ Tgd.T  # (:114)
    # projection into ref grey camera (:117-126)
    KrPr = jnp.stack(
        [
            Krg[0, 0] * Pr_g[..., 0] + Krg[0, 2] * Pr_g[..., 2],
            Krg[1, 1] * Pr_g[..., 1] + Krg[1, 2] * Pr_g[..., 2],
            Pr_g[..., 2],
        ],
        axis=-1,
    )
    pr_u = KrPr[..., 0] / KrPr[..., 2]
    pr_v = KrPr[..., 1] / KrPr[..., 2]
    # live grey camera (:129-137)
    Pl = Pr_g @ Tlr.T
    KlPl = jnp.stack(
        [
            Klg[0, 0] * Pl[..., 0] + Klg[0, 2] * Pl[..., 2],
            Klg[1, 1] * Pl[..., 1] + Klg[1, 2] * Pl[..., 2],
            Pl[..., 2],
        ],
        axis=-1,
    )
    pl_u = KlPl[..., 0] / KlPl[..., 2]
    pl_v = KlPl[..., 1] / KlPl[..., 2]

    depth_ok = jnp.isfinite(depth) & (depth > min_depth) & (depth < max_depth)
    in_imgs = sampling.in_bounds(img_ref, pr_u, pr_v, 2) & sampling.in_bounds(
        img_live, pl_u, pl_v, 2
    )
    Il = sampling.bilinear(img_live, pl_u, pl_v)
    Ir = sampling.bilinear(img_ref, pr_u, pr_v)
    y = Il - Ir
    sat_ok = jnp.ones_like(y, bool)
    if discard_saturated:
        sat_ok = (Il != 0) & (Il != 255) & (Ir != 0) & (Ir != 255)

    dIx, dIy = sampling.central_diff_bilinear(img_live, pl_u, pl_v)
    dI = jnp.stack([dIx, dIy], axis=-1)
    J = _proj_jacobian_rows(dI, KlPl, KlgTlr, Pr_g[..., :3])
    valid = depth_ok & in_imgs & sat_ok & jnp.isfinite(y)
    w = reweighting.weight_tukey(y, c)
    return reduce_system(J, y, w, valid)


def pose_refinement_from_disparity_esm(img_live, img_ref, disp_ref, baseline,
                                       Klg, Krg, Krd, Tgd, Tlr, KlgTlr, c,
                                       discard_saturated: bool = False,
                                       min_depth=0.2, max_depth=20.0):
    """PoseRefinementFromDisparityESM (cu_model_refinement.cu:420-455):
    depth from disparity via the depth camera's intrinsics, then the ESM
    builder."""
    import jax.numpy as jnp

    depth = jnp.where(
        disp_ref > 0, Krd[0, 0] * baseline / jnp.maximum(disp_ref, 1e-9), jnp.nan
    )
    return pose_refinement_from_depth_esm(
        img_live, img_ref, depth, Klg, Krg, Krd, Tgd, Tlr, KlgTlr, c,
        discard_saturated, min_depth, max_depth,
    )


def kt_lr(K, T_lr):
    """K (3,3 or Intrinsics) times T_lr (3, 4)."""
    Km = K.matrix() if hasattr(K, "matrix") else jnp.asarray(K)
    return Km @ T_lr
