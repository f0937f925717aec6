"""Everything on the compute path is pure JAX: gradients flow end-to-end.

The CUDA reference has no autodiff story at all; differentiability is a new
capability of the TPU-native design (e.g. for self-supervised depth or
learned cost volumes on top of these ops).
"""
import jax
import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.geometry import depth as depth_mod
from kangaroo_tpu.variational import rof


def test_rof_denoise_is_differentiable(rng):
    noisy = jnp.asarray(rng.random((16, 16)).astype(np.float32))
    target = jnp.zeros((16, 16))

    def loss(lam):
        u = rof.denoise(noisy, lam=lam, iterations=10)
        return jnp.mean((u - target) ** 2)

    g = jax.grad(loss)(5.0)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_tsdf_fuse_grad_wrt_depth(rng):
    W, H = 32, 24
    K = kt.Intrinsics.centered(30.0, W, H)
    bbox = kt.BoundingBox.create((-1, -1, -1), (1, 1, 1))
    vol = kt.TsdfVolume.create(16, 16, 16, bbox, trunc_dist=0.2)
    T_cw = se3.inverse(se3.make(np.eye(3), [0.0, 0.0, -3.0]))
    depth0 = jnp.full((H, W), 3.0)

    def loss(depth):
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)
        out = sdf_mod.sdf_fuse(vol, depth, norm, T_cw, K, 0.2)
        return jnp.sum(jnp.where(out.weight > 0, out.val, 0.0) ** 2)

    g = jax.grad(loss)(depth0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_photometric_system_grad_wrt_pose(rng):
    from kangaroo_tpu.solvers import photometric

    W, H = 32, 24
    K = kt.Intrinsics.centered(30.0, W, H)
    img = jnp.asarray(rng.random((H, W)).astype(np.float32) * 255)
    pts = depth_mod.depth_to_vbo(jnp.full((H, W), 2.0), K)
    Km = jnp.asarray(np.asarray(K.matrix()))

    def loss(xi):
        T = se3.exp(xi)
        s = photometric.pose_refinement_from_points(img, img, pts, Km @ T, 50.0)
        return s.sqErr

    g = jax.grad(loss)(jnp.zeros(6) + 1e-3)
    assert np.isfinite(np.asarray(g)).all()
