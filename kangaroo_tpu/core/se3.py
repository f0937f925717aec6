"""SE3/SO3 rigid-transform helpers on (3, 4) pose matrices.

TPU-native equivalent of the reference's sparse SE3 ops
(include/kangaroo/MatUtils.h:138-400): mulSO3/mulSO3inv/mulSE3/mulSE3inv,
SE3inv, SE3Translation, the six SE3 generator products, and Plane_b_from_a.
Plus an exp map (Rodrigues) for Gauss-Newton pose updates, which the reference
delegates to Sophus in its apps.

A pose ``T_ba`` is a (3, 4) float32 array [R | t] mapping frame a -> frame b.
Point batches are (..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp


def identity():
    return jnp.concatenate([jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1)


def make(R, t):
    R = jnp.asarray(R, jnp.float32).reshape(3, 3)
    t = jnp.asarray(t, jnp.float32).reshape(3, 1)
    return jnp.concatenate([R, t], axis=1)


def rotation(T):
    return T[:, :3]


def translation(T):
    """MatUtils.h:221-225."""
    return T[:, 3]


def transform(T, p):
    """T * p for points p (..., 3): rotate + translate (mulSE3, MatUtils.h:188)."""
    p = jnp.asarray(p)
    return p @ T[:, :3].T + T[:, 3]


def rotate(T, v):
    """R * v (mulSO3, MatUtils.h:138-165)."""
    return jnp.asarray(v) @ T[:, :3].T


def rotate_inv(T, v):
    """R^T * v (mulSO3inv, MatUtils.h:168-186)."""
    return jnp.asarray(v) @ T[:, :3]


def transform_inv(T, p):
    """T^-1 * p (mulSE3inv, MatUtils.h:198-206)."""
    return (jnp.asarray(p) - T[:, 3]) @ T[:, :3]


def inverse(T):
    """SE3inv (MatUtils.h:208-219)."""
    R = T[:, :3]
    t = T[:, 3:]
    return jnp.concatenate([R.T, -R.T @ t], axis=1)


def compose(T_cb, T_ba):
    """T_ca = T_cb * T_ba."""
    R = T_cb[:, :3] @ T_ba[:, :3]
    t = T_cb[:, :3] @ T_ba[:, 3:] + T_cb[:, 3:]
    return jnp.concatenate([R, t], axis=1)


def generator_products(p):
    """gen_i * p for the 6 SE3 generators, stacked (..., 6, 3).

    Order (tx, ty, tz, rx, ry, rz), matching SE3gen0..5mul (MatUtils.h:320-405).
    """
    p = jnp.asarray(p)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    o = jnp.ones_like(x)
    zz = jnp.zeros_like(x)
    g0 = jnp.stack([o, zz, zz], axis=-1)
    g1 = jnp.stack([zz, o, zz], axis=-1)
    g2 = jnp.stack([zz, zz, o], axis=-1)
    g3 = jnp.stack([zz, -z, y], axis=-1)
    g4 = jnp.stack([z, zz, -x], axis=-1)
    g5 = jnp.stack([-y, x, zz], axis=-1)
    return jnp.stack([g0, g1, g2, g3, g4, g5], axis=-2)


def plane_b_from_a(T_ab, n_a):
    """Transform plane n.x = -1 params: n_b = R^T n_a / (t . n_a + 1)
    (Plane_b_from_a, MatUtils.h:475-488)."""
    n_a = jnp.asarray(n_a)
    den = jnp.dot(translation(T_ab), n_a) + 1.0
    return rotate_inv(T_ab, n_a) / den


def skew(w):
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def exp(xi):
    """SE3 exponential map: xi = (tx, ty, tz, rx, ry, rz) -> (3, 4) pose.

    Replaces Sophus::SE3::exp used by the reference apps for GN updates
    (applications/kinectfusion/main.cpp:323-334).
    """
    xi = jnp.asarray(xi, jnp.float32).reshape(6)
    v, w = xi[:3], xi[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = skew(w)
    W2 = W @ W
    # Small-angle-safe Taylor blends.
    small = theta2 < 1e-10
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    R = jnp.eye(3, dtype=jnp.float32) + A * W + B * W2
    V = jnp.eye(3, dtype=jnp.float32) + B * W + C * W2
    t = V @ v
    return jnp.concatenate([R, t[:, None]], axis=1)


def log(T):
    """SE3 log map: (3, 4) pose -> (tx, ty, tz, rx, ry, rz). Inverse of
    :func:`exp`; used by the pose-graph residuals (extra/PoseGraph.h)."""
    T = jnp.asarray(T, jnp.float32)
    R = T[:, :3]
    t = T[:, 3]
    # clip strictly inside (-1, 1): arccos' gradient is infinite at +-1 and
    # would propagate NaN through jacfwd (pose-graph Jacobians)
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    theta2 = theta * theta
    small = theta < 1e-5
    # rotation vector from the skew-symmetric part
    w_raw = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    scale = jnp.where(small, 0.5 + theta2 / 12.0, theta / (2.0 * jnp.sin(theta) + 1e-30))
    w = scale * w_raw
    W = skew(w)
    W2 = W @ W
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.maximum(theta, 1e-30))
    # V^-1 (closed form)
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, 1e-30))
    Vinv = jnp.eye(3, dtype=jnp.float32) - 0.5 * W + coef * W2
    v = Vinv @ t
    return jnp.concatenate([v, w])


def to_matrix4(T):
    """(3, 4) -> (4, 4) homogeneous."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([T, bottom], axis=0)
