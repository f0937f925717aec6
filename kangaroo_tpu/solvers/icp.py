"""Projective point-plane ICP system builder.

TPU-native equivalent of PoseRefinementProjectiveIcpPointPlane
(src/cu_model_refinement.cu:536-608): per-pixel residual+Jacobian fused with
the normal-equation reduction (solvers.lss.reduce_system runs on the MXU),
replacing the CUDA shared-memory tree reduce + thrust pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import reweighting, sampling, se3
from .lss import LSS, reduce_system


@functools.partial(jax.jit, static_argnames=("assoc_radius", "gather_bits"))
def icp_point_plane(points_live, points_ref, normals_ref, KT_lr, T_rl, c,
                    assoc_radius: int | None = None, K_live=None,
                    gather_bits: bool = True) -> LSS:
    """Build the 6-dof point-plane system (cu_model_refinement.cu:541-608).

    points_live: (H, W, 4) live point image ("dPl"); points_ref / normals_ref:
    (H, W, 4) reference-frame model points+normals from raycasting (normal w=1
    marks valid); KT_lr: (3, 4) = K * T_lr projecting reference points into
    the live image; T_rl: (3, 4) live -> reference; c: Tukey constant.

    Residual: y = (T_rl p_live_hat - P_r) . N_r, weight (1/P_r.z) Tukey.

    ``assoc_radius``: the reference's projective association is a per-pixel
    nearest-neighbour GATHER of the live point image — the single most
    expensive op on TPU (~2 ms at VGA, the measured XLA gather floor).
    During tracking the projection offsets are a few pixels (consecutive
    frames, coarse-to-fine refinement), so with ``assoc_radius=r`` the
    gather becomes a (2r+1)^2 masked-shift stencil (lane/sublane rolls, one
    fused elementwise pass): pixels whose match lies further than r get no
    association this iteration — identical to the gather whenever the
    offset is within the window. ``None`` keeps the exact gather. Only
    meaningful when points_ref lies on the live pixel lattice (same camera
    grid); the separable raycast's sweep-grid cloud adds a grid-warp
    displacement the window cannot cover — pass K_live instead there.

    ``K_live``: (fu, fv, u0, v0) of the live camera. The live VBO is a pure
    function of its depth channel and the pixel index (depth_to_vbo), so
    with intrinsics known the association gathers ONE channel instead of
    four and reconstructs x, y bit-identically at the matched index —
    quartering the gather bytes of the exact association.
    """
    H, W = points_ref.shape[:2]
    Hl, Wl = points_live.shape[:2]
    Pr = points_ref[..., :3]
    Nr = normals_ref[..., :3]
    nr_valid = normals_ref[..., 3] == 1.0

    KPl = Pr @ KT_lr[:, :3].T + KT_lr[:, 3]
    pl_u = KPl[..., 0] / KPl[..., 2]
    pl_v = KPl[..., 1] / KPl[..., 2]
    in_img = sampling.in_bounds(points_live[..., 0], pl_u, pl_v, 3)

    def reconstruct(z, ui, vi):
        # depth_to_vbo's exact op order: ray = (u-u0)/fu, then ray * z
        fu, fv, u0, v0 = K_live
        x = (ui.astype(jnp.float32) - u0) / fu * z
        y = (vi.astype(jnp.float32) - v0) / fv * z
        return jnp.stack([x, y, z], axis=-1)

    # GetNearestNeighbour (cu_model_refinement.cu:560)
    if assoc_radius is None:
        ui = jnp.clip(jnp.floor(pl_u + 0.5), 0, Wl - 1).astype(jnp.int32)
        vi = jnp.clip(jnp.floor(pl_v + 0.5), 0, Hl - 1).astype(jnp.int32)
        if K_live is None:
            _Pl = sampling.nearest(points_live, pl_u, pl_v)[..., :3]
        else:
            # 16-bit-halves gather (sampling.take_f32_bits): bit-exact and
            # 2.7x the plain f32 take — this association was the single
            # largest op in the one-jit KF frame (2.2 ms of 5.7, xplane)
            z = sampling.take_f32(points_live[..., 2].reshape(-1),
                                  (vi * Wl + ui).astype(jnp.int32),
                                  bits=gather_bits)
            _Pl = reconstruct(z, ui, vi)
        pl_valid = jnp.isfinite(_Pl[..., 2])
    else:
        r = assoc_radius
        ui = jnp.floor(pl_u + 0.5).astype(jnp.int32)  # nearest() convention
        vi = jnp.floor(pl_v + 0.5).astype(jnp.int32)
        vv, uu = jnp.mgrid[0:H, 0:W]
        du = ui - uu
        dv = vi - vv
        found = jnp.zeros((H, W), bool)
        if K_live is None:
            live3 = points_live[..., :3]
            _Pl = jnp.zeros((H, W, 3), jnp.float32)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    m = (dv == dy) & (du == dx)
                    # in_img guarantees the matched index is in-bounds
                    # wherever m holds, so the roll wrap never selects
                    # wrapped data
                    cand = jnp.roll(live3, (-dy, -dx), axis=(0, 1))
                    _Pl = jnp.where(m[..., None], cand, _Pl)
                    found = found | m
        else:
            zl = points_live[..., 2]
            z = jnp.zeros((H, W), jnp.float32)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    m = (dv == dy) & (du == dx)
                    z = jnp.where(m, jnp.roll(zl, (-dy, -dx), axis=(0, 1)), z)
                    found = found | m
            _Pl = reconstruct(z, ui, vi)
        pl_valid = found & jnp.isfinite(_Pl[..., 2])

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
