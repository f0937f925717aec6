"""GN solvers: LSS reduction, ICP pose recovery, photometric alignment,
plane fit, Manhattan rotation."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import raycast as rc
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.geometry import depth as depth_mod
from kangaroo_tpu.solvers import icp, lss, manhattan, photometric, plane_fit


class TestLSS:
    def test_reduce_matches_manual(self, rng):
        M, N = 37, 6
        J = rng.normal(size=(M, N)).astype(np.float32)
        y = rng.normal(size=(M,)).astype(np.float32)
        w = rng.random(M).astype(np.float32)
        valid = rng.random(M) > 0.3
        s = lss.reduce_system(jnp.asarray(J), jnp.asarray(y), jnp.asarray(w), jnp.asarray(valid))
        JTJ = np.zeros((N, N))
        JTy = np.zeros(N)
        sq = 0.0
        for i in range(M):
            if valid[i]:
                JTJ += w[i] * np.outer(J[i], J[i])
                JTy += w[i] * y[i] * J[i]
                sq += y[i] ** 2
        np.testing.assert_allclose(np.asarray(s.JTJ), JTJ, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.JTy), JTy, rtol=1e-4, atol=1e-5)
        assert float(s.sqErr) == pytest.approx(sq, rel=1e-4)
        assert float(s.obs) == valid.sum()

    def test_nan_rows_do_not_poison(self):
        J = jnp.array([[1.0, jnp.nan], [1.0, 2.0]])
        y = jnp.array([jnp.nan, 1.0])
        w = jnp.ones(2)
        valid = jnp.array([False, True])
        s = lss.reduce_system(J, y, w, valid)
        assert np.isfinite(np.asarray(s.JTJ)).all()
        assert float(s.obs) == 1

    def test_solve(self):
        A = jnp.array([[2.0, 0.0], [0.0, 4.0]])
        b = jnp.array([2.0, 8.0])
        s = lss.LSS(A, b, jnp.zeros(()), jnp.ones(()))
        np.testing.assert_allclose(np.asarray(s.solve()), [1.0, 2.0], rtol=1e-5)

    def test_rmse_zero_obs_is_nan(self):
        """obs == 0 (total tracking loss) must report NaN like the
        reference's sqrt(0/0) (kinectfusion/main.cpp:316), so the app's
        auto-reset fires instead of seeing a perfect rmse of 0."""
        s = lss.LSS.zero(6)
        assert not np.isfinite(float(s.rmse()))


def _sphere_scene(res=48):
    bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
    vol = kt.TsdfVolume.create(res, res, res, bbox, trunc_dist=0.1)
    # three spheres with non-collinear centers and distinct radii: all 6 dof
    # observable (one or two spheres leave rotational null spaces)
    pos = vol.voxel_positions()
    d1 = jnp.linalg.norm(pos - jnp.array([0.25, 0.0, 0.0]), axis=-1) - 0.6
    d2 = jnp.linalg.norm(pos - jnp.array([-0.45, 0.35, 0.3]), axis=-1) - 0.4
    d3 = jnp.linalg.norm(pos - jnp.array([-0.2, -0.5, -0.3]), axis=-1) - 0.3
    return kt.TsdfVolume(
        jnp.minimum(jnp.minimum(d1, d2), d3), jnp.ones_like(vol.weight), bbox
    )


class TestICP:
    def test_recovers_small_motion(self):
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        vol = _sphere_scene()

        T_wp = se3.make(np.eye(3), [0.0, 0.0, -3.0])  # model/raycast pose
        xi_true = jnp.array([0.02, -0.015, 0.03, 0.01, -0.012, 0.008])
        T_wl = se3.compose(T_wp, se3.inverse(se3.exp(xi_true)))  # live pose

        # model: raycast from T_wp
        d_p, n_p, _ = rc.raycast_sdf(vol, T_wp, K, W, H, near=0.5, far=8.0)
        v_p = depth_mod.depth_to_vbo(jnp.where(jnp.isfinite(d_p), d_p, jnp.nan), K)
        # live: raycast depth from T_wl
        d_l, _, _ = rc.raycast_sdf(vol, T_wl, K, W, H, near=0.5, far=8.0)
        v_l = depth_mod.depth_to_vbo(jnp.where(jnp.isfinite(d_l), d_l, jnp.nan), K)

        T_lp = se3.identity()
        Km = np.asarray(K.matrix())
        for _ in range(10):
            KT_lp = jnp.asarray(Km) @ T_lp
            T_pl = se3.inverse(T_lp)
            s = icp.icp_point_plane(v_l, v_p, n_p, KT_lp, T_pl, 0.1)
            s = lss.LSS(s.JTJ + 0.5 * jnp.eye(6), s.JTy, s.sqErr, s.obs)
            x = -s.solve()
            T_lp = se3.compose(T_lp, se3.exp(x))

        # truth: T_lp = T_wl^-1 * T_wp
        T_lp_true = se3.compose(se3.inverse(T_wl), T_wp)
        np.testing.assert_allclose(np.asarray(T_lp), np.asarray(T_lp_true), atol=5e-3)
        assert float(s.rmse()) < 0.01


class TestPhotometric:
    def test_recovers_translation(self, rng):
        # textured fronto-parallel plane at depth 2; live camera shifted in x
        W, H = 64, 48
        K = kt.Intrinsics.centered(60.0, W, H)
        tex = rng.random((H * 2, W * 2)).astype(np.float32) * 255

        def render(tx):
            # plane z=2 world; camera at (tx, 0, 0): pixel (u,v) sees world
            # point (tx + 2*(u-u0)/fu, 2*(v-v0)/fv, 2); texture indexed by world xy
            v, u = np.mgrid[0:H, 0:W].astype(np.float32)
            wx = tx + 2.0 * (u - float(K.u0)) / float(K.fu)
            wy = 2.0 * (v - float(K.v0)) / float(K.fv)
            # map world coords to texture pixels
            tu = wx * float(K.fu) / 2.0 + W
            tv = wy * float(K.fv) / 2.0 + H
            from kangaroo_tpu.core import sampling

            return np.asarray(sampling.bilinear(jnp.asarray(tex), jnp.asarray(tu), jnp.asarray(tv)))

        tx_true = 0.04
        img_ref = render(0.0)
        img_live = render(tx_true)
        depth_ref = jnp.full((H, W), 2.0)

        # single-camera ESM setup: all intrinsics equal, Tgd = I
        Km = jnp.asarray(np.asarray(K.matrix()))
        I4 = jnp.eye(4)
        T_lr = np.eye(4, dtype=np.float32)
        est = 0.0
        for _ in range(8):
            T_lr_j = jnp.asarray(T_lr)
            KlgTlr = Km @ T_lr_j[:3]
            s = photometric.pose_refinement_from_depth_esm(
                jnp.asarray(img_live), jnp.asarray(img_ref), depth_ref,
                Km, Km, Km, I4, T_lr_j, KlgTlr, c=50.0,
            )
            x = -np.asarray(s.solve(damping=1e-3))
            dT = np.asarray(se3.exp(jnp.asarray(x)))
            T34 = np.asarray(se3.compose(jnp.asarray(T_lr[:3]), jnp.asarray(dT)))
            T_lr = np.eye(4, dtype=np.float32)
            T_lr[:3] = T34
        # live camera at +tx means T_lr translation x = -tx (ref point appears
        # shifted by -tx in live camera coords)
        assert T_lr[0, 3] == pytest.approx(-tx_true, abs=0.01)

    def test_from_points_runs(self, rng):
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        pts = depth_mod.depth_to_vbo(jnp.full((H, W), 2.0), K)
        KT = photometric.kt_lr(K, se3.identity())
        s = photometric.pose_refinement_from_points(img, img, pts, KT, 0.1)
        assert float(s.obs) > 0
        assert float(s.sqErr) == pytest.approx(0.0, abs=1e-6)


class TestPlaneFit:
    def test_recovers_plane(self, rng):
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        # plane n . P = -1 with n = (0.1, -0.05, -0.45)
        n_true = np.array([0.1, -0.05, -0.45], np.float32)
        v, u = np.mgrid[0:H, 0:W].astype(np.float32)
        rx = (u - float(K.u0)) / float(K.fu)
        ry = (v - float(K.v0)) / float(K.fv)
        z = -1.0 / (n_true[0] * rx + n_true[1] * ry + n_true[2])
        pts = np.stack([rx * z, ry * z, z, np.ones_like(z)], axis=-1)
        pts += rng.normal(0, 1e-3, pts.shape).astype(np.float32) * np.array([1, 1, 1, 0])
        Qinv = plane_fit.make_q_inv(K, W, H)
        # Tukey rejects everything if the init is far off (reference behaves
        # the same, plane_c=0.5); start within the basin.
        n_est, _ = plane_fit.fit_plane(
            jnp.asarray(pts), Qinv, z0=(0.45, 0.45, 0.45), iterations=40, c=0.5
        )
        np.testing.assert_allclose(np.asarray(n_est), n_true, atol=5e-3)


class TestManhattan:
    def test_identity_for_axis_aligned_edges(self):
        # vertical + horizontal stripes: edges aligned with world axes
        W, H = 48, 48
        K = kt.Intrinsics.centered(40.0, W, H)
        img = np.zeros((H, W), np.float32)
        img[:, ::8] = 255.0
        img[::8, :] = 255.0
        s = manhattan.manhattan_line_cost(jnp.asarray(img), jnp.eye(3), K)
        assert float(s.obs) > 0
        # residual gradient should be tiny at the true rotation
        assert np.linalg.norm(np.asarray(s.JTy)) / max(float(s.obs), 1) < 0.05


class TestIcpAssociationVariants:
    """The TPU association variants (solvers/icp.py): the depth-only K_live
    gather must be bit-equal to the 4-channel gather, and the bounded
    window must equal the exact gather when offsets fit inside it."""

    def _setup(self):
        import kangaroo_tpu as kt
        from kangaroo_tpu.fusion import raycast as rc
        from kangaroo_tpu.geometry import depth as depth_mod

        W, H = 64, 48
        K = kt.Intrinsics.centered(50.0, W, H)
        T_wc = se3.make(np.eye(3), [0.0, 0.0, -3.0])
        prev = jnp.full((H, W), jnp.nan)
        gt, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
        pts = depth_mod.depth_to_vbo(gt, K)
        norm = depth_mod.normals_from_vbo(pts)
        Km = jnp.asarray(np.asarray(K.matrix()))
        # a small pose perturbation: association offsets of a few pixels
        dx = jnp.asarray([0.01, -0.008, 0.004, 0.002, -0.003, 0.001])
        T_lr = se3.exp(dx)
        return K, Km, pts, norm, T_lr

    def test_k_live_depth_only_gather_bit_equal(self):
        from kangaroo_tpu.solvers import icp as icp_mod

        K, Km, pts, norm, T_lr = self._setup()
        T_rl = se3.inverse(T_lr)
        want = icp_mod.icp_point_plane(pts, pts, norm, Km @ T_lr, T_rl, 0.1)
        got = icp_mod.icp_point_plane(
            pts, pts, norm, Km @ T_lr, T_rl, 0.1,
            K_live=(Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2]))
        np.testing.assert_array_equal(np.asarray(got.JTJ), np.asarray(want.JTJ))
        np.testing.assert_array_equal(float(got.obs), float(want.obs))

    def test_windowed_association_matches_exact(self):
        from kangaroo_tpu.solvers import icp as icp_mod

        K, Km, pts, norm, T_lr = self._setup()
        T_rl = se3.inverse(T_lr)
        want = icp_mod.icp_point_plane(pts, pts, norm, Km @ T_lr, T_rl, 0.1)
        for K_live in (None, (Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2])):
            got = icp_mod.icp_point_plane(pts, pts, norm, Km @ T_lr, T_rl,
                                          0.1, assoc_radius=4, K_live=K_live)
            np.testing.assert_array_equal(np.asarray(got.JTJ),
                                          np.asarray(want.JTJ))
            np.testing.assert_array_equal(float(got.obs), float(want.obs))

    def test_window_too_small_drops_pixels_only(self):
        from kangaroo_tpu.solvers import icp as icp_mod

        K, Km, pts, norm, T_lr = self._setup()
        # a large translation: offsets exceed radius 1 for many pixels —
        # the windowed system must use a SUBSET of the exact associations
        T_big = se3.make(np.eye(3), [0.2, 0.0, 0.0])
        T_rl = se3.inverse(T_big)
        exact = icp_mod.icp_point_plane(pts, pts, norm, Km @ T_big, T_rl, 0.1)
        small = icp_mod.icp_point_plane(pts, pts, norm, Km @ T_big, T_rl, 0.1,
                                        assoc_radius=1)
        assert float(small.obs) <= float(exact.obs)


class TestIcpGoldenScalarModel:
    def test_system_matches_pixel_loop(self):
        """Production fused residual+Jacobian+MXU reduction vs an
        independent per-pixel accumulation loop (reference_impl.py;
        PoseRefinementProjectiveIcpPointPlane,
        cu_model_refinement.cu:541-608)."""
        import reference_impl as ref

        W, H = 32, 24
        K = kt.Intrinsics.centered(28.0, W, H)
        vol = _sphere_scene(32)
        T_wp = se3.make(np.eye(3), [0.0, 0.0, -3.0])
        xi = jnp.array([0.02, -0.015, 0.03, 0.01, -0.012, 0.008])
        T_wl = se3.compose(T_wp, se3.inverse(se3.exp(xi)))

        d_p, n_p, _ = rc.raycast_sdf(vol, T_wp, K, W, H, near=0.5, far=8.0)
        v_p = depth_mod.depth_to_vbo(d_p, K)
        d_l, _, _ = rc.raycast_sdf(vol, T_wl, K, W, H, near=0.5, far=8.0)
        v_l = depth_mod.depth_to_vbo(d_l, K)

        Km = np.asarray(K.matrix())
        T_lp = se3.identity()
        KT_lp = jnp.asarray(Km) @ T_lp
        T_pl = se3.inverse(T_lp)
        K_live = (Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2])
        s = icp.icp_point_plane(v_l, v_p, n_p, KT_lp, T_pl, 0.1,
                                K_live=K_live)
        JTJ, JTy, sq, obs = ref.icp_point_plane(
            np.asarray(v_l, np.float64), np.asarray(v_p, np.float64),
            np.asarray(n_p, np.float64), np.asarray(KT_lp, np.float64),
            np.asarray(T_pl, np.float64), 0.1, K_live)
        assert int(s.obs) == obs
        np.testing.assert_allclose(np.asarray(s.sqErr), sq, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s.JTy), JTy, rtol=1e-4,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(s.JTJ), JTJ, rtol=1e-4,
                                   atol=1e-7)
