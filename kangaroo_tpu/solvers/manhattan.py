"""Manhattan-frame rotation estimation from image edges.

TPU-native equivalent of ManhattanLineCost (src/cu_manhattan.cu:10-130):
Holoborodko 5x3 edge filters, back-project each strong edge to the normal of
its interpretation plane, classify against the rotation hypothesis' axes, and
accumulate a Gauss-Newton system on the 3-dof rotation update.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lss import LSS, reduce_system


def _holoborodko(img):
    """5x3 / 3x5 smooth-derivative filters (cu_manhattan.cu:36-46),
    normalised by 32*255."""
    f = img.astype(jnp.float32)
    H, W = f.shape
    p = jnp.pad(f, 2, mode="edge")

    def s(dx, dy):
        return jax.lax.dynamic_slice(p, (2 + dy, 2 + dx), (H, W))

    dx = (
        (s(2, -1) + 2 * s(1, -1) - 2 * s(-1, -1) - s(-2, -1))
        + (2 * s(2, 0) + 4 * s(1, 0) - 4 * s(-1, 0) - 2 * s(-2, 0))
        + (s(2, 1) + 2 * s(1, 1) - 2 * s(-1, 1) - s(-2, 1))
    ) / (32.0 * 255.0)
    dy = (
        (s(-1, 2) + 2 * s(-1, 1) - 2 * s(-1, -1) - s(-1, -2))
        + (2 * s(0, 2) + 4 * s(0, 1) - 4 * s(0, -1) - 2 * s(0, -2))
        + (s(1, 2) + 2 * s(1, 1) - 2 * s(1, -1) - s(1, -2))
    ) / (32.0 * 255.0)
    return dx, dy


@jax.jit
def manhattan_line_cost(img, Rhat, K, cut=0.05, min_grad=0.05) -> LSS:
    """Build the LSS<3> over so3 updates to Rhat (cu_manhattan.cu:10-130)."""
    H, W = img.shape
    dx, dy = _holoborodko(img)
    mag = jnp.sqrt(dx * dx + dy * dy)

    v, u = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    rayx = (u - K.u0) / K.fu
    rayy = (v - K.v0) / K.fv
    line = jnp.stack([-dy, dx, jnp.zeros_like(dx)], axis=-1)
    ray = jnp.stack([rayx, rayy, jnp.ones_like(rayx)], axis=-1)
    n = jnp.cross(line, ray)
    m = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    dots = m @ Rhat.T  # (..., 3): (dotx, doty, dotz)
    d2 = dots * dots
    dxx, dyy, dzz = d2[..., 0], d2[..., 1], d2[..., 2]

    # dR/dw_k applied to m: Rhat * (gen_k x m) (cu_manhattan.cu:66-68)
    mx, my, mz = m[..., 0], m[..., 1], m[..., 2]
    z = jnp.zeros_like(mx)
    dRm = jnp.stack(
        [
            jnp.stack([z, mz, -my], axis=-1),
            jnp.stack([-mz, z, mx], axis=-1),
            jnp.stack([my, -mx, z], axis=-1),
        ],
        axis=-2,
    )  # (..., 3 params, 3 vec)
    dRRm = dRm @ Rhat.T  # (..., 3 params, 3 axes)

    is_x = dxx < cut * jnp.minimum(dyy, dzz)
    is_y = (~is_x) & (dyy < cut * jnp.minimum(dxx, dzz))
    is_z = (~is_x) & (~is_y) & (dzz < cut * jnp.minimum(dxx, dyy))
    axis = jnp.where(is_x, 0, jnp.where(is_y, 1, 2))
    classified = is_x | is_y | is_z

    f = mag * jnp.take_along_axis(dots, axis[..., None], axis=-1)[..., 0]
    Jsel = jnp.take_along_axis(dRRm, axis[..., None, None], axis=-1)[..., 0]
    J = mag[..., None] * Jsel

    edge = mag > min_grad
    # obs counts every strong edge; unclassified edges contribute zero J/f
    f = jnp.where(classified, f, 0.0)
    J = jnp.where(classified[..., None], J, 0.0)
    y_res = f
    w = jnp.ones_like(f)
    x_idx = jnp.arange(W)[None, :]
    y_idx = jnp.arange(H)[:, None]
    interior = (x_idx >= 3) & (x_idx < W - 3) & (y_idx >= 3) & (y_idx < H - 3)
    return reduce_system(J, y_res, w, edge & interior)


def estimate_manhattan_rotation(img, K, R0=None, iterations: int = 10,
                                cut=0.05, min_grad=0.05):
    """Iterate GN on the rotation (host loop as in the reference's usage)."""
    from ..core import se3 as se3_mod

    R = jnp.eye(3, dtype=jnp.float32) if R0 is None else jnp.asarray(R0, jnp.float32)
    for _ in range(iterations):
        s = manhattan_line_cost(img, R, K, cut, min_grad)
        dw = s.solve(damping=1e-6)
        # zero classified edges -> singular system -> NaN from Cholesky;
        # hold the rotation instead of poisoning it
        dw = jnp.where(jnp.isfinite(dw), dw, 0.0)
        dR = se3_mod.exp(jnp.concatenate([jnp.zeros(3), -dw]))[:, :3]
        R = R @ dR
    return R
