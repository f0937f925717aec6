"""TSDF fusion + raycast: analytic-shape round trips (the reference's own
verification strategy, applications/examples/SdfFusion.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import raycast as rc
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.geometry import depth as depth_mod


W, H = 48, 36
VOL_RES = 48


def _camera():
    K = kt.Intrinsics.centered(40.0, W, H)
    # camera at z=-3 looking at origin (world = camera axes)
    T_wc = se3.make(np.eye(3), [0.0, 0.0, -3.0])
    return K, T_wc


def _sphere_vol(r=0.9):
    bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
    vol = kt.TsdfVolume.create(VOL_RES, VOL_RES, VOL_RES, bbox, trunc_dist=0.1)
    return sdf_mod.sdf_sphere(vol, (0.0, 0.0, 0.0), r)


class TestAnalyticRaycasts:
    def test_sphere_depth(self):
        K, T_wc = _camera()
        prev = jnp.full((H, W), jnp.nan)
        depth, img = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
        # center pixel: sphere front face at z=-0.9 -> depth 2.1
        assert float(depth[H // 2, W // 2]) == pytest.approx(2.1, abs=1e-3)

    def test_box_depth(self):
        K, T_wc = _camera()
        bbox = kt.BoundingBox.create((-1, -1, -1), (1, 1, 1))
        d = rc.raycast_box(bbox, T_wc, K, W, H)
        assert float(d[H // 2, W // 2]) == pytest.approx(2.0, abs=1e-4)

    def test_plane_depth(self):
        K, T_wc = _camera()
        # plane n.x = -1 with n = (0,0,-1)/2: z = ... compute via formula
        prev = jnp.full((H, W), jnp.nan)
        n_w = (0.0, 0.0, -0.5)  # plane z = 2 in world: n.x = -1
        d, img = rc.raycast_plane(prev, T_wc, K, n_w, W, H)
        # world plane z=2 seen from camera at z=-3: depth 5 at center
        assert float(d[H // 2, W // 2]) == pytest.approx(5.0, abs=1e-3)


class TestSdfRaycast:
    def test_sphere_sdf_raycast_matches_analytic(self):
        K, T_wc = _camera()
        vol = _sphere_vol(0.9)
        depth, norm, img = rc.raycast_sdf(vol, T_wc, K, W, H, near=0.5, far=8.0)
        prev = jnp.full((H, W), jnp.nan)
        gt, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
        d = np.asarray(depth)
        g = np.asarray(gt)
        # compare on pixels well inside the silhouette
        r_pix = 0.75 * np.tan(np.arcsin(0.9 / 3.0)) * 40.0
        yy, xx = np.mgrid[0:H, 0:W]
        inside = (xx - W // 2) ** 2 + (yy - H // 2) ** 2 < r_pix**2
        assert np.isfinite(d[inside]).mean() > 0.98
        err = np.abs(d[inside] - g[inside])
        assert np.nanmean(err) < 0.02  # within ~half voxel (voxel=0.051)

    def test_normals_point_at_camera(self):
        K, T_wc = _camera()
        vol = _sphere_vol(0.9)
        _, norm, _ = rc.raycast_sdf(vol, T_wc, K, W, H, near=0.5, far=8.0)
        n = np.asarray(norm)[H // 2, W // 2]
        assert n[3] == 1.0
        np.testing.assert_allclose(n[:3], [0, 0, -1], atol=0.1)

    def test_sdf_distance_zero_at_surface(self):
        K, T_wc = _camera()
        vol = _sphere_vol(0.9)
        depth, _, _ = rc.raycast_sdf(vol, T_wc, K, W, H, near=0.5, far=8.0)
        depth_f = jnp.where(jnp.isfinite(depth), depth, 2.1)
        dist = sdf_mod.sdf_distance(depth_f, vol, T_wc, K)
        center_region = np.asarray(dist)[H // 2 - 3 : H // 2 + 3, W // 2 - 3 : W // 2 + 3]
        assert np.abs(center_region).max() < 0.02


class TestFusion:
    def test_fuse_sphere_roundtrip(self):
        """Fuse analytic sphere depth maps from several views, raycast back,
        compare to analytic depth (the SdfFusion.cpp self-test)."""
        K, _ = _camera()
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        trunc = 0.15
        vol = kt.TsdfVolume.create(VOL_RES, VOL_RES, VOL_RES, bbox, trunc_dist=trunc)

        def pose(angle):
            c, s = np.cos(angle), np.sin(angle)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t = R @ np.array([0, 0, -3.0], np.float32)
            return se3.make(R, t)

        for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            T_wc = pose(ang)
            prev = jnp.full((H, W), jnp.nan)
            gt_depth, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
            vbo = depth_mod.depth_to_vbo(gt_depth, K)
            norm = depth_mod.normals_from_vbo(vbo)
            T_cw = se3.inverse(T_wc)
            vol = sdf_mod.sdf_fuse(vol, gt_depth, norm, T_cw, K, trunc, 1000.0, 0.1)

        assert float(vol.weight.max()) > 0

        T_wc = pose(0.3)
        depth, _, _ = rc.raycast_sdf(vol, T_wc, K, W, H, near=0.5, far=8.0)
        prev = jnp.full((H, W), jnp.nan)
        gt, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
        d = np.asarray(depth)
        g = np.asarray(gt)
        r_pix = 0.7 * np.tan(np.arcsin(0.9 / 3.0)) * 40.0
        yy, xx = np.mgrid[0:H, 0:W]
        inside = (xx - W // 2) ** 2 + (yy - H // 2) ** 2 < r_pix**2
        assert np.isfinite(d[inside]).mean() > 0.95
        err = np.abs(d[inside] - g[inside])
        assert np.nanmean(err) < 0.05

    def test_fuse_weights_saturate(self):
        K, T_wc = _camera()
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        vol = kt.TsdfVolume.create(16, 16, 16, bbox, trunc_dist=0.2)
        depth = jnp.full((H, W), 3.0)
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)
        T_cw = se3.inverse(T_wc)
        for _ in range(3):
            vol = sdf_mod.sdf_fuse(vol, depth, norm, T_cw, K, 0.2, max_w=0.5)
        assert float(vol.weight.max()) <= 0.5 + 1e-6

    def test_color_fuse_runs(self):
        K, T_wc = _camera()
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        vol = kt.TsdfVolume.create(16, 16, 16, bbox, trunc_dist=0.2)
        cvol = kt.BoundedVolume.create(16, 16, 16, bbox, fill=0.5)
        depth = jnp.full((H, W), 3.0)
        img = jnp.full((H, W, 3), 128.0)
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)
        T_cw = se3.inverse(T_wc)
        vol2, cvol2 = sdf_mod.sdf_fuse_color(
            vol, cvol, depth, norm, T_cw, K, img, T_cw, K, 0.2
        )
        assert np.isfinite(np.asarray(vol2.val)).all()
        updated = np.asarray(vol2.weight) > 0
        assert updated.any()
        np.testing.assert_allclose(np.asarray(cvol2.data)[updated], 128.0 / 255.0, atol=1e-5)


class TestGoldenScalarModels:
    """Independent voxel/pixel-loop golden models (tests/reference_impl.py)
    for the fuse weight/truncation arithmetic and the sphere-trace march —
    vectorised-vs-vectorised round trips cannot catch a shared systematic
    error in e.g. the weighted-average blend (cu_sdffusion.cu:16-61)."""

    def test_fuse_matches_voxel_loop(self):
        import reference_impl as ref

        res, w, h = 12, 24, 18
        K = kt.Intrinsics.centered(20.0, w, h)
        T_wc = se3.make(np.eye(3), [0.05, -0.04, -3.0])
        T_cw = se3.inverse(T_wc)
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        trunc = 0.3
        vol = kt.TsdfVolume.create(res, res, res, bbox, trunc_dist=trunc)
        # seed a partial prior state so the += blend path is exercised
        rng = np.random.default_rng(3)
        w0 = jnp.asarray((rng.random((res, res, res)) < 0.5)
                         * rng.random((res, res, res)) * 4.0).astype(jnp.float32)
        v0 = jnp.asarray(rng.standard_normal((res, res, res)) * 0.1).astype(jnp.float32)
        vol = kt.TsdfVolume(v0, w0, bbox)

        prev = jnp.full((h, w), jnp.nan)
        depth, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, w, h)
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)

        got = sdf_mod.sdf_fuse(vol, depth, norm, T_cw, K, trunc, 6.0, 0.1)
        Kp = (float(K.fu), float(K.fv), float(K.u0), float(K.v0))
        want_v, want_w = ref.sdf_fuse(
            np.asarray(v0, np.float64), np.asarray(w0, np.float64),
            np.asarray(bbox.lo), np.asarray(bbox.hi),
            np.asarray(depth, np.float64), np.asarray(norm, np.float64),
            np.asarray(T_cw, np.float64), Kp, trunc, max_w=6.0,
            mincostheta=0.1)
        np.testing.assert_allclose(np.asarray(got.weight), want_w,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.val), want_v,
                                   rtol=1e-4, atol=1e-5)

    def test_raycast_matches_pixel_loop(self):
        import reference_impl as ref

        res, w, h = 24, 20, 16
        K = kt.Intrinsics.centered(18.0, w, h)
        T_wc = se3.make(np.eye(3), [0.0, 0.0, -3.0])
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        vol = kt.TsdfVolume.create(res, res, res, bbox, trunc_dist=0.2)
        vol = sdf_mod.sdf_sphere(vol, (0.1, -0.05, 0.0), 0.8)

        depth, _, _ = rc.raycast_sdf(vol, T_wc, K, w, h, near=0.5, far=8.0,
                                     subpix=True)
        Kp = (float(K.fu), float(K.fv), float(K.u0), float(K.v0))
        want = ref.raycast_sdf_depth(
            np.asarray(vol.val, np.float64), np.asarray(bbox.lo),
            np.asarray(bbox.hi), np.asarray(T_wc, np.float64), Kp,
            w, h, near=0.5, far=8.0, subpix=True)
        got = np.asarray(depth)
        hit_g, hit_w = np.isfinite(got), np.isfinite(want)
        # f32 vs f64 marching may disagree at silhouette-grazing pixels
        assert (hit_g != hit_w).mean() <= 0.02
        both = hit_g & hit_w
        assert both.sum() >= 60  # the sphere silhouette is ~77 px here
        np.testing.assert_allclose(got[both], want[both], atol=2e-3)
