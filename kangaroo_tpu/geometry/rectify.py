"""Scanline rectification for stereo rigs.

TPU-native equivalent of extra/ScanlineRectify.h: from a relative pose T_rl
and the two cameras' intrinsics/distortion, compute a common rectifying
rotation, the per-camera homographies, and the distortion+homography lookup
tables used by ops.warp.warp. Returns the rectified relative pose T_nr_nl
(pure x-axis baseline).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..ops import warp as warp_mod


def create_scanline_rectified_lookup(w: int, h: int, T_rl, K_l, K_r,
                                     lk1=0.0, lk2=0.0, rk1=0.0, rk2=0.0):
    """Build left/right rectification lookup tables
    (CreateScanlineRectifiedLookupAndT_rl, ScanlineRectify.h:22-80).

    T_rl: (3, 4) left -> right. Returns (lookup_left, lookup_right, T_nr_nl,
    R_nl) with lookups (h, w, 2).
    """
    T_rl = np.asarray(T_rl, np.float64)
    R_rl = T_rl[:, :3]
    l_r = T_rl[:, 3]
    R_lr = R_rl.T
    r_l = -(R_lr @ l_r)

    # up vectors in the left frame (ScanlineRectify.h:36-44)
    lup_l = np.array([0.0, 1.0, 0.0])
    rup_l = R_lr @ np.array([0.0, 1.0, 0.0])
    lfwd = np.cross(lup_l, r_l)
    rfwd = np.cross(rup_l, r_l)
    new_fwd = lfwd + rfwd
    new_fwd = new_fwd / np.linalg.norm(new_fwd)

    x = r_l / np.linalg.norm(r_l)
    z = -new_fwd
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    R_nl = np.stack([x, y, z], axis=1)  # columns = new basis in left frame

    baseline = np.linalg.norm(r_l)
    T_nr_nl = np.concatenate(
        [np.eye(3), np.array([[-baseline], [0.0], [0.0]])], axis=1
    ).astype(np.float32)

    Kl = np.asarray(K_l.matrix(), np.float64)
    Kr = np.asarray(K_r.matrix(), np.float64)
    H_l = Kl @ R_nl.T @ np.linalg.inv(Kl)
    H_r = Kr @ (R_nl.T @ R_lr).T @ np.linalg.inv(Kr)
    # lookup tables map NEW image coords -> ORIGINAL (distorted) coords, so
    # they use the inverse homographies (the reference passes H_on "new to
    # original", built from the transposes above; ScanlineRectify.h:61-77)
    H_l_inv = np.linalg.inv(H_l)
    H_r_inv = np.linalg.inv(H_r)

    lut_l = warp_mod.create_matlab_lookup_table(
        w, h, float(Kl[0, 0]), float(Kl[1, 1]), float(Kl[0, 2]), float(Kl[1, 2]),
        lk1, lk2, H_on=jnp.asarray(H_l_inv, jnp.float32),
    )
    lut_r = warp_mod.create_matlab_lookup_table(
        w, h, float(Kr[0, 0]), float(Kr[1, 1]), float(Kr[0, 2]), float(Kr[1, 2]),
        rk1, rk2, H_on=jnp.asarray(H_r_inv, jnp.float32),
    )
    return lut_l, lut_r, jnp.asarray(T_nr_nl), jnp.asarray(R_nl, jnp.float32)


def baseline_from_t_rl(T_rl) -> float:
    """Stereo baseline from the rig's relative pose
    (extra/BaselineFromCamModel.h)."""
    return float(np.linalg.norm(np.asarray(T_rl)[:, 3]))
