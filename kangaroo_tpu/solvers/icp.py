"""Projective point-plane ICP system builder.

TPU-native equivalent of PoseRefinementProjectiveIcpPointPlane
(src/cu_model_refinement.cu:536-608): per-pixel residual+Jacobian fused with
the normal-equation reduction (solvers.lss.reduce_system runs on the MXU),
replacing the CUDA shared-memory tree reduce + thrust pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import reweighting, sampling, se3
from .lss import LSS, reduce_system


@jax.jit
def icp_point_plane(points_live, points_ref, normals_ref, KT_lr, T_rl, c) -> LSS:
    """Build the 6-dof point-plane system (cu_model_refinement.cu:541-608).

    points_live: (H, W, 4) live point image ("dPl"); points_ref / normals_ref:
    (H, W, 4) reference-frame model points+normals from raycasting (normal w=1
    marks valid); KT_lr: (3, 4) = K * T_lr projecting reference points into
    the live image; T_rl: (3, 4) live -> reference; c: Tukey constant.

    Residual: y = (T_rl p_live_hat - P_r) . N_r, weight (1/P_r.z) Tukey.
    """
    H, W = points_ref.shape[:2]
    Pr = points_ref[..., :3]
    Nr = normals_ref[..., :3]
    nr_valid = normals_ref[..., 3] == 1.0

    KPl = Pr @ KT_lr[:, :3].T + KT_lr[:, 3]
    pl_u = KPl[..., 0] / KPl[..., 2]
    pl_v = KPl[..., 1] / KPl[..., 2]
    in_img = sampling.in_bounds(points_live[..., 0], pl_u, pl_v, 3)

    # GetNearestNeighbour (cu_model_refinement.cu:560)
    _Pl = sampling.nearest(points_live, pl_u, pl_v)[..., :3]
    pl_valid = jnp.isfinite(_Pl[..., 2])

    _Pr = _Pl @ T_rl[:, :3].T + T_rl[:, 3]
    Dr = _Pr - Pr
    y = jnp.sum(Dr * Nr, axis=-1)

    # Jr_i = -gen_i(_Pr) . Nr (cu_model_refinement.cu:568-575)
    G = se3.generator_products(_Pr)  # (H, W, 6, 3)
    J = -jnp.sum(G * Nr[..., None, :], axis=-1)  # (H, W, 6)

    valid = jnp.isfinite(Pr[..., 2]) & nr_valid & in_img & pl_valid & jnp.isfinite(y)
    w = (1.0 / Pr[..., 2]) * reweighting.weight_tukey(y, c)
    return reduce_system(J, y, w, valid)


def solve_pose_update(sum_lss: LSS, rotation_only: bool = False):
    """Solve the reduced system and return the se3 update vector x such that
    T_lp <- exp(x) * T_lp (kinectfusion/main.cpp:323-334). With
    ``rotation_only`` solves only the 3x3 rotation block (used at the
    coarsest pyramid level, main.cpp:326-331)."""
    if rotation_only:
        from .lss import solve_spd

        x_rot = solve_spd(sum_lss.JTJ[3:, 3:], sum_lss.JTy[3:])
        return jnp.concatenate([jnp.zeros(3, jnp.float32), x_rot])
    return sum_lss.solve()
