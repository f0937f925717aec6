"""TV operators for primal-dual solvers.

TPU-native equivalent of include/kangaroo/Divergence.h: forward gradient with
zero boundary at the far edge, divergence with zero boundary at the near edge
(adjoint pair), the TGV symmetrised gradient Epsilon, its adjoint, and
unit-ball projections. All operate on (H, W) scalars, (H, W, 2) vector fields,
and (H, W, 3) symmetric 2x2 tensor fields.

The reference stores Epsilon's output as float4 duplicating the off-diagonal
(Divergence.h:66-89); we store the 3 unique components (xx, yy, xy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grad_forward(u):
    """Forward-difference gradient, zero at the far boundary
    (GradUFwd, Divergence.h:39-46). (H, W) -> (H, W, 2)."""
    dx = jnp.zeros_like(u).at[:, :-1].set(u[:, 1:] - u[:, :-1])
    dy = jnp.zeros_like(u).at[:-1, :].set(u[1:, :] - u[:-1, :])
    return jnp.stack([dx, dy], axis=-1)


def divergence(p):
    """Backward-difference divergence, adjoint of -grad_forward
    (DivA for float2, Divergence.h:52-59). (H, W, 2) -> (H, W)."""
    px = p[..., 0]
    py = p[..., 1]
    div = px + py
    div = div.at[:, 1:].add(-px[:, :-1])
    div = div.at[1:, :].add(-py[:-1, :])
    return div


def epsilon(v):
    """Symmetrised gradient of a vector field (Epsilon, Divergence.h:66-89).

    (H, W, 2) -> (H, W, 3) storing (dx v0, dy v1, (dy v0 + dx v1)/2)."""
    v0 = v[..., 0]
    v1 = v[..., 1]
    dx_v0 = jnp.zeros_like(v0).at[:, :-1].set(v0[:, 1:] - v0[:, :-1])
    dx_v1 = jnp.zeros_like(v1).at[:, :-1].set(v1[:, 1:] - v1[:, :-1])
    dy_v0 = jnp.zeros_like(v0).at[:-1, :].set(v0[1:, :] - v0[:-1, :])
    dy_v1 = jnp.zeros_like(v1).at[:-1, :].set(v1[1:, :] - v1[:-1, :])
    return jnp.stack([dx_v0, dy_v1, (dy_v0 + dx_v1) / 2.0], axis=-1)


def divergence_sym(q):
    """Adjoint "generalised divergence" of a symmetric tensor field
    (DivA for float4, Divergence.h:95-112). (H, W, 3) -> (H, W, 2).

    With q = (xx, yy, xy): div_x = dx- xx + dy- xy, div_y = dx- xy + dy- yy.
    """
    xx = q[..., 0]
    yy = q[..., 1]
    xy = q[..., 2]
    d0 = xx + xy
    d0 = d0.at[:, 1:].add(-xx[:, :-1])
    d0 = d0.at[1:, :].add(-xy[:-1, :])
    d1 = xy + yy
    d1 = d1.at[:, 1:].add(-xy[:, :-1])
    d1 = d1.at[1:, :].add(-yy[:-1, :])
    return jnp.stack([d0, d1], axis=-1)


def project_unit_ball(p, maxrad=1.0):
    """p / max(1, |p|/maxrad) over the last axis (ProjectUnitBall,
    Divergence.h:11-33)."""
    mag = jnp.sqrt(jnp.sum(p * p, axis=-1, keepdims=True))
    return p / jnp.maximum(1.0, mag / maxrad)


def project_unit_ball_sym(q, maxrad=1.0):
    """Unit-ball projection of the symmetric tensor field matching the
    reference's float4 norm, where the off-diagonal appears twice
    (Divergence.h:29-33)."""
    mag = jnp.sqrt(
        q[..., 0] ** 2 + q[..., 1] ** 2 + 2.0 * q[..., 2] ** 2
    )[..., None]
    return q / jnp.maximum(1.0, mag / maxrad)


def project_unit_ball_scalar(r, maxrad=1.0):
    return r / jnp.maximum(1.0, jnp.abs(r) / maxrad)
