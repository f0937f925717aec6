"""Photometric calibration system builders.

TPU-native equivalent of the calibration kernels in
src/cu_model_refinement.cu:

  * :func:`calibration_rgbd_from_depth_esm` — refine the depth->colour
    extrinsic T_cd from a photometric constraint between two RGBD keyframes
    (BuildCalibrationRgbdFromDepthmapSystemESM, :225-353 /
    CalibrationRgbdFromDepthESM, :495-533): residual
    y = I_live(pi(K Tcd Tlr P_d)) - I_ref(pi(K Tcd P_d)), Jacobian
    J = Jl1 - Jl2 over the 6-dof T_cd update.

  * :func:`kinect_calibration` — joint 12-dof photometric system over
    (T_cd, T_lr) for colour keyframes (KernKinectCalibration, :614-701).
    The reference's colour residual uses 3-channel images; we accept
    grayscale or rgb and sum the per-channel Tukey weights as it does.

  * :func:`stereo_intrinsics_refine` — capability replacement for
    extra/StereoIntrinsicsOptimisation.h (a Ceres bundle block): Gauss-Newton
    over (fu, fv, u0, v0, T_rl) that minimises reprojection error of known
    3D points; Jacobians via jax.jacfwd.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import reweighting, sampling, se3
from .lss import LSS, reduce_system


def _dpi(KP):
    """Rows of d(dehomogenise)/dP at KP: returns callables applying the 2x3."""
    z = KP[..., 2]
    return z


def _sparse_j(vKT, P):
    """J_i = vKT . (gen_i P) given vKT (..., 3) and P (..., 3) -> (..., 6)."""
    x, y_, zz = P[..., 0], P[..., 1], P[..., 2]
    J3 = -vKT[..., 1] * zz + vKT[..., 2] * y_
    J4 = vKT[..., 0] * zz - vKT[..., 2] * x
    J5 = -vKT[..., 0] * y_ + vKT[..., 1] * x
    return jnp.concatenate([vKT, jnp.stack([J3, J4, J5], axis=-1)], axis=-1)


def _grad_rows(img, u, v):
    gx, gy = sampling.central_diff_bilinear(img, u, v)
    return jnp.stack([gx, gy], axis=-1)


def _dpi_apply(dI, KP):
    """(dI . dpi(KP)) as a (..., 3) row vector."""
    z = KP[..., 2]
    a = dI[..., 0] / z
    b = dI[..., 1] / z
    c = -(dI[..., 0] * KP[..., 0] + dI[..., 1] * KP[..., 1]) / (z * z)
    return jnp.stack([a, b, c], axis=-1)


@jax.jit
def calibration_rgbd_from_depth_esm(img_live, img_ref, points_depth, K, T_cd,
                                    T_lr, c, min_depth=0.2, max_depth=20.0,
                                    discard_saturated: bool = False) -> LSS:
    """6-dof T_cd refinement (cu_model_refinement.cu:225-353).

    points_depth: (H, W, 4) points in the reference DEPTH camera; K: (3, 3)
    colour intrinsics; T_cd: (3, 4) depth->colour; T_lr: (3, 4) ref->live in
    the depth frame.
    """
    Pr_d = points_depth[..., :3]
    Pl_d = Pr_d @ T_lr[:, :3].T + T_lr[:, 3]
    Pr_c = Pr_d @ T_cd[:, :3].T + T_cd[:, 3]
    Pl_c = Pl_d @ T_cd[:, :3].T + T_cd[:, 3]
    KPr = Pr_c @ K.T
    KPl = Pl_c @ K.T
    pr_u, pr_v = KPr[..., 0] / KPr[..., 2], KPr[..., 1] / KPr[..., 2]
    pl_u, pl_v = KPl[..., 0] / KPl[..., 2], KPl[..., 1] / KPl[..., 2]

    depth_ok = (
        jnp.isfinite(points_depth[..., 2])
        & (points_depth[..., 2] > min_depth)
        & (points_depth[..., 2] < max_depth)
    )
    inb = sampling.in_bounds(img_live, pl_u, pl_v, 2) & sampling.in_bounds(
        img_ref, pr_u, pr_v, 2
    )
    Il = sampling.bilinear(img_live, pl_u, pl_v)
    Ir = sampling.bilinear(img_ref, pr_u, pr_v)
    y = Il - Ir
    sat_ok = jnp.ones_like(y, bool)
    if discard_saturated:
        sat_ok = (Il != 0) & (Il != 255) & (Ir != 0) & (Ir != 255)

    KT = K @ T_cd[:, :3]  # (K * Tcd) rotation block: rows applied to gen products
    vl = _dpi_apply(_grad_rows(img_live, pl_u, pl_v), KPl) @ KT
    vr = _dpi_apply(_grad_rows(img_ref, pr_u, pr_v), KPr) @ KT
    Jl1 = _sparse_j(vl, Pl_d)  # (cu_model_refinement.cu:292-300)
    Jl2 = _sparse_j(vr, Pr_d)  # (:302-309)
    J = Jl1 - Jl2
    w = jnp.ones_like(y)  # reference uses w = 1 here (:336)
    valid = depth_ok & inb & sat_ok & jnp.isfinite(y)
    return reduce_system(J, y, w, valid)


@jax.jit
def kinect_calibration(points_live, img_live, points_ref, img_ref, KcT_cd,
                       T_lr, c) -> LSS:
    """Joint 12-dof (T_cd, T_lr) photometric system
    (KernKinectCalibration, cu_model_refinement.cu:614-701).

    points_*: (H, W, 4) depth-camera point images; img_*: (H, W) or (H, W, 3)
    colour; KcT_cd: (3, 4) = K_colour * T_cd. Parameter order: first 6 = T_cd
    update, last 6 = T_lr update.
    """
    Pr = points_ref[..., :3]
    Pl = Pr @ T_lr[:, :3].T + T_lr[:, 3]
    _pl = Pl @ KcT_cd[:, :3].T + KcT_cd[:, 3]
    _pr = Pr @ KcT_cd[:, :3].T + KcT_cd[:, 3]
    pl_u, pl_v = _pl[..., 0] / _pl[..., 2], _pl[..., 1] / _pl[..., 2]
    pr_u, pr_v = _pr[..., 0] / _pr[..., 2], _pr[..., 1] / _pr[..., 2]
    inb = sampling.in_bounds(img_live, pl_u, pl_v, 2) & sampling.in_bounds(
        img_ref, pr_u, pr_v, 2
    )
    multi = img_live.ndim == 3

    Il = sampling.bilinear(img_live, pl_u, pl_v)
    Ir = sampling.bilinear(img_ref, pr_u, pr_v)
    y = Il - Ir  # (..., C) or (...)

    Kc = KcT_cd[:, :3]
    KcT_lr = KcT_cd @ jnp.concatenate(
        [T_lr, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
    )

    def channel_rows(ch):
        dl = _grad_rows(img_live[..., ch] if multi else img_live, pl_u, pl_v)
        dr = _grad_rows(img_ref[..., ch] if multi else img_ref, pr_u, pr_v)
        vl = _dpi_apply(dl, _pl) @ Kc
        vr = _dpi_apply(dr, _pr) @ Kc
        vl_lr = _dpi_apply(dl, _pl) @ KcT_lr[:, :3]
        J_cd = _sparse_j(vl, Pl) - _sparse_j(vr, Pr)  # (:652-660)
        J_lr = _sparse_j(vl_lr, Pr)  # (:661-666)
        return jnp.concatenate([J_cd, J_lr], axis=-1)

    if multi:
        C = img_live.shape[-1]
        Js = [channel_rows(ch) for ch in range(C)]
        ys = [y[..., ch] for ch in range(C)]
        w = sum(reweighting.weight_tukey(yc, c) for yc in ys)
        valid = jnp.isfinite(points_ref[..., 2]) & jnp.isfinite(Pl[..., 2]) & inb
        out = LSS.zero(12)
        for Jc, yc in zip(Js, ys):
            out = out + reduce_system(Jc, yc, w, valid & jnp.isfinite(yc))
        return out
    J = channel_rows(0)
    w = reweighting.weight_tukey(y, c)
    valid = jnp.isfinite(points_ref[..., 2]) & jnp.isfinite(Pl[..., 2]) & inb & jnp.isfinite(y)
    return reduce_system(J, y, w, valid)


def stereo_intrinsics_refine(points_w, obs_l, obs_r, K0, T_rl0,
                             iterations: int = 20, damping: float = 1e-3):
    """Refine shared pinhole intrinsics (fu, fv, u0, v0) and the rig pose
    T_rl from known world points and their pixel observations in both
    cameras (capability equivalent of extra/StereoIntrinsicsOptimisation.h).

    points_w: (N, 3) points in the LEFT camera frame; obs_l/obs_r: (N, 2)
    pixels. Returns (Intrinsics, T_rl).
    """
    from ..containers.intrinsics import Intrinsics

    points_w = jnp.asarray(points_w, jnp.float32)
    obs_l = jnp.asarray(obs_l, jnp.float32)
    obs_r = jnp.asarray(obs_r, jnp.float32)
    theta0 = jnp.concatenate(
        [
            jnp.stack([K0.fu, K0.fv, K0.u0, K0.v0]),
            jnp.zeros(6, jnp.float32),
        ]
    )
    T_rl0 = jnp.asarray(T_rl0, jnp.float32)

    def residuals(theta):
        fu, fv, u0, v0 = theta[0], theta[1], theta[2], theta[3]
        T_rl = se3.compose(se3.exp(theta[4:10]), T_rl0)
        P_r = points_w @ T_rl[:, :3].T + T_rl[:, 3]

        def proj(P):
            return jnp.stack(
                [u0 + fu * P[..., 0] / P[..., 2], v0 + fv * P[..., 1] / P[..., 2]],
                axis=-1,
            )

        return jnp.concatenate(
            [(proj(points_w) - obs_l).ravel(), (proj(P_r) - obs_r).ravel()]
        )

    theta = theta0
    for _ in range(iterations):
        J = jax.jacfwd(residuals)(theta)
        r = residuals(theta)
        from .lss import solve_spd

        theta = theta - solve_spd(J.T @ J, J.T @ r, damping)
        # re-anchor the pose part so exp stays near identity
        T_new = se3.compose(se3.exp(theta[4:10]), T_rl0)
        T_rl0 = T_new
        theta = theta.at[4:10].set(0.0)

    K = Intrinsics(theta[0], theta[1], theta[2], theta[3])
    return K, T_rl0
