"""Robust plane fitting from a point image.

TPU-native equivalent of PlaneFitGN (src/cu_plane_fit.cu:9-73): Tukey-weighted
Gauss-Newton on the plane parameterisation n = Qinv z_hat with plane equation
n . P = -1, residual y = d * (n . P + 1), d = 1/|n|, and the reference's
analytic Jacobian. Returns an LSS<3> over the z_hat update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lss import LSS, reduce_system


@jax.jit
def plane_fit_gn(points, Qinv, zhat, zmin=0.1, zmax=100.0, c=0.1) -> LSS:
    """points: (H, W, 4) point image; Qinv: (3, 3); zhat: (3,)."""
    P = points[..., :3]
    Pz = points[..., 2]
    nhat = Qinv @ zhat  # (3,)
    dinv = jnp.sqrt(jnp.dot(nhat, nhat))
    d = 1.0 / dinv
    np_p1 = P @ nhat + 1.0
    y = d * np_p1
    # Tukey weight (cu_plane_fit.cu:26-29)
    roc = y / c
    om = 1.0 - roc * roc
    w = jnp.where(jnp.abs(y) <= c, om * om, 0.0)
    # dn/dz_i = zhat[i] * Qinv[:, i] (cu_plane_fit.cu:33-44)
    J = []
    for i in range(3):
        dn = zhat[i] * Qinv[:, i]
        Ji = (-(d**3) * np_p1) * jnp.dot(nhat, dn) + d * (P @ dn)
        J.append(Ji)
    J = jnp.stack(J, axis=-1)
    valid = jnp.isfinite(Pz) & (Pz > zmin) & (Pz < zmax)
    return reduce_system(J, y, w, valid)


def make_q_inv(K, w: int, h: int):
    """Plane parameterisation basis from three pixels below the horizon:
    Q = -(Kinv U)^T with U = [(w, h/2), (0, h), (w, h)] homogeneous
    (stereo2/main.cpp:129-131). The plane is n = Qinv z with z the inverse
    depths along those three rays, kept positive by multiplicative updates."""
    import numpy as np

    U = np.array([[w, 0, w], [h / 2.0, h, h], [1.0, 1.0, 1.0]], np.float32)
    Kinv = np.asarray(K.inverse_matrix())
    Q = -(Kinv @ U).T
    return jnp.asarray(np.linalg.inv(Q).astype(np.float32))


def fit_plane(points, Qinv, z0=None, iterations: int = 10, zmin=0.1,
              zmax=100.0, c=0.1):
    """Iterated GN plane fit with the reference's multiplicative update
    z_i *= exp(-x_i), step clamped to unit norm (stereo2/main.cpp:508-519).

    Returns (n, z): plane normal n = Qinv z with n . P = -1 on the plane.
    """
    z = jnp.full((3,), 0.2, jnp.float32) if z0 is None else jnp.asarray(z0, jnp.float32)

    def body(_, z):
        s = plane_fit_gn(points, Qinv, z, zmin, zmax, c)
        x = -s.solve(damping=1e-9)
        # a rank-deficient system (degenerate point set) yields NaN from
        # the Cholesky solve — skip the step instead of poisoning z
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        nrm = jnp.linalg.norm(x)
        x = jnp.where(nrm > 1.0, x / nrm, x)
        return z * jnp.exp(x)

    z = jax.lax.fori_loop(0, iterations, body, z)
    return Qinv @ z, z


def plane_basis_wp(n):
    """(3, 4) SE3 pose of the fitted plane: origin at the plane point
    closest to the frame origin (the plane is n . P = -1, so that point is
    -n/|n|^2), z axis along the plane normal, x/y any orthonormal tangent
    pair (deterministic Gram-Schmidt against the smallest normal
    component). Role of ``PlaneBasis_wp`` in stereo2/main.cpp:525,601 —
    the symbol itself lives in the external SceneGraph dependency, so the
    tangent-axis convention here is our own (any orthonormal pair spans
    the same heightmap plane)."""
    n = jnp.asarray(n, jnp.float32)
    nn = jnp.dot(n, n)
    z_axis = n / jnp.sqrt(jnp.maximum(nn, 1e-20))
    # pick the world axis least aligned with the normal as the seed
    seed = jnp.eye(3, dtype=jnp.float32)[jnp.argmin(jnp.abs(z_axis))]
    x_axis = seed - jnp.dot(seed, z_axis) * z_axis
    x_axis = x_axis / jnp.maximum(jnp.linalg.norm(x_axis), 1e-20)
    y_axis = jnp.cross(z_axis, x_axis)
    R = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    origin = -n / jnp.maximum(nn, 1e-20)
    return jnp.concatenate([R, origin[:, None]], axis=1)
