"""Gather-free plane-sweep fusion/raycast vs the exact gather-based paths.

The separable implementations (fusion/separable.py) must agree with
sdf.sdf_fuse (bilinear) and raycast.raycast_sdf up to the documented
sub-intermediate-pixel resampling tolerance, across translated AND rotated
poses (the factorization must hold for general SE3, not just axis-aligned).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import raycast as rc
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.fusion import separable as sep
from kangaroo_tpu.geometry import depth as depth_mod


def _rot(ax, ay, az):
    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return rz(az) @ ry(ay) @ rx(ax)


def _scene(pose_angles=(0.0, 0.0, 0.0), vol_shape=(48, 40, 44)):
    W, H = 64, 48
    K = kt.Intrinsics.centered(55.0, W, H)
    bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
    Wv, Hv, Dv = vol_shape
    vol = kt.TsdfVolume.create(Wv, Hv, Dv, bbox, trunc_dist=0.15)
    Rm = _rot(*pose_angles)
    T_wc = se3.make(Rm, Rm @ np.array([0.0, 0.0, -3.0]))
    prev = jnp.full((H, W), jnp.nan)
    gt, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
    vbo = depth_mod.depth_to_vbo(gt, K)
    norm = depth_mod.normals_from_vbo(vbo)
    return K, vol, jnp.asarray(T_wc), gt, norm, W, H


POSES = [(0.0, 0.0, 0.0), (0.2, 0.3, 0.0), (-0.15, 0.25, 0.4)]


class TestSeparableFuse:
    @pytest.mark.parametrize("angles", POSES)
    @pytest.mark.parametrize("warp", ["nearest", "bilinear"])
    def test_matches_bilinear_fuse(self, angles, warp):
        K, vol, T_wc, gt, norm, W, H = _scene(angles)
        T_cw = se3.inverse(T_wc)
        want = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        got = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1,
                                     warp=warp)
        ww = np.asarray(want.weight)
        gw = np.asarray(got.weight)
        # bilinear stage-1 double-spreads validity: strictly conservative
        # (skips boundary voxels, almost never adds). The default nearest
        # stage-1 matches the reference's single bilinear spread (better
        # coverage) at half-pixel value jitter near depth edges.
        if warp == "bilinear":
            assert (gw > 0).sum() > 0.75 * (ww > 0).sum()
            assert ((gw > 0) & ~(ww > 0)).sum() < 0.01 * (ww > 0).sum()
            med_tol, max_tol = 2e-3, 0.15 * 0.2
        else:
            assert (gw > 0).sum() > 0.9 * (ww > 0).sum()
            assert ((gw > 0) & ~(ww > 0)).sum() < 0.06 * (ww > 0).sum()
            med_tol, max_tol = 5e-3, 0.15 * 0.5
        both = (ww > 0) & (gw > 0)
        dv = np.abs(np.asarray(want.val)[both] - np.asarray(got.val)[both])
        assert np.median(dv) < med_tol
        assert dv.max() < max_tol
        dw = np.abs(ww[both] - gw[both])
        assert np.median(dw) < 2e-2

    def test_colour_fuse_matches_exact(self):
        K, vol, T_wc, gt, norm, W, H = _scene((0.2, 0.3, 0.0))
        T_cw = se3.inverse(T_wc)
        from kangaroo_tpu.containers.volume import BoundedVolume

        cvol = BoundedVolume.create(*vol.val.shape[::-1], vol.bbox, fill=0.5)
        rgb = jnp.broadcast_to(
            jnp.linspace(0, 255, W)[None, :, None], (H, W, 3)).astype(jnp.float32)
        T_iw = se3.compose(
            jnp.asarray(se3.inverse(se3.make(np.eye(3), [0.05, 0.0, 0.0]))),
            T_cw)
        want_v, want_c = sdf_mod.sdf_fuse_color(
            vol, cvol, gt, norm, T_cw, K, rgb, T_iw, K, 0.15, 1000.0, 0.1)
        got_v, got_c = sep.sdf_fuse_color_separable(
            vol, cvol, gt, norm, T_cw, K, rgb, T_iw, K, 0.15, 1000.0, 0.1)
        ww, gw = np.asarray(want_v.weight), np.asarray(got_v.weight)
        assert (gw > 0).sum() > 0.85 * (ww > 0).sum()
        both = (ww > 0) & (gw > 0)
        dv = np.abs(np.asarray(want_v.val)[both] - np.asarray(got_v.val)[both])
        assert np.median(dv) < 5e-3
        wc, gc = np.asarray(want_c.data), np.asarray(got_c.data)
        dc = np.abs(wc[both] - gc[both])
        assert np.median(dc) < 0.02
        # untouched voxels keep the 0.5 reset value
        np.testing.assert_array_equal(gc[gw == 0], 0.5)

    def test_perpendicular_pose_uses_other_axis(self):
        """Looking along world x (z-planes edge-on): the auto axis switch
        must pick the x-sweep and still match the exact fuse."""
        K, vol, T_wc, gt, norm, W, H = _scene((0.0, 1.45, 0.0))
        T_cw = se3.inverse(T_wc)
        want = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        got = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        ww, gw = np.asarray(want.weight), np.asarray(got.weight)
        assert (ww > 0).sum() > 100
        assert (gw > 0).sum() > 0.85 * (ww > 0).sum()
        both = (ww > 0) & (gw > 0)
        dv = np.abs(np.asarray(want.val)[both] - np.asarray(got.val)[both])
        assert np.median(dv) < 5e-3
        # raycast from the same pose must hit and agree
        vol1 = want
        d1, _, _ = rc.raycast_sdf(vol1, T_wc, K, W, H, near=0.5, far=8.0,
                                  trunc_dist=0.15)
        d2, _, _ = sep.raycast_sdf_separable(vol1, T_wc, K, W, H, near=0.5,
                                             far=8.0, trunc_dist=0.15)
        a, b = np.asarray(d1), np.asarray(d2)
        m = np.isfinite(a) & np.isfinite(b)
        assert m.sum() > 0.75 * np.isfinite(a).sum()
        assert np.median(np.abs(a[m] - b[m])) < 0.02

    def test_empty_frame_fuses_nothing(self):
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        nan_depth = jnp.full((H, W), jnp.nan)
        got = sep.sdf_fuse_separable(vol, nan_depth, norm, T_cw, K, 0.15)
        assert float(got.weight.max()) == 0.0

    def test_accumulates_weight_over_frames(self):
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        v1 = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15)
        v2 = sep.sdf_fuse_separable(v1, gt, norm, T_cw, K, 0.15)
        m = np.asarray(v1.weight) > 0
        np.testing.assert_allclose(
            np.asarray(v2.weight)[m], 2 * np.asarray(v1.weight)[m], rtol=1e-5
        )
        # same observations -> same value
        np.testing.assert_allclose(
            np.asarray(v2.val)[m], np.asarray(v1.val)[m], atol=1e-5
        )


class TestSeparableRaycast:
    @pytest.mark.parametrize("angles", POSES)
    @pytest.mark.parametrize("normals", ["depth", "gradient"])
    def test_matches_exact_raycast(self, angles, normals):
        K, vol, T_wc, gt, norm, W, H = _scene(angles)
        T_cw = se3.inverse(T_wc)
        vol1 = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        d1, n1, _ = rc.raycast_sdf(vol1, T_wc, K, W, H, near=0.5, far=8.0,
                                   trunc_dist=0.15)
        d2, n2, _ = sep.raycast_sdf_separable(vol1, T_wc, K, W, H, near=0.5,
                                              far=8.0, trunc_dist=0.15,
                                              normals=normals)
        a, b = np.asarray(d1), np.asarray(d2)
        fa, fb = np.isfinite(a), np.isfinite(b)
        assert (fa & fb).sum() > 0.8 * fa.sum()
        both = fa & fb
        dd = np.abs(a[both] - b[both])
        voxel = 2.4 / 43
        assert np.median(dd) < 0.3 * voxel
        na = np.asarray(n1)[both][:, :3]
        nb = np.asarray(n2)[both][:, :3]
        ok = (np.linalg.norm(na, axis=-1) > 0.5) & (np.linalg.norm(nb, axis=-1) > 0.5)
        dot = np.sum(na[ok] * nb[ok], axis=-1)
        # depth-difference normals are noisier than volume-gradient ones at
        # this tiny test resolution (forward differences of a NN-warped
        # depth map); gradient mode reproduces the reference's normals
        assert np.median(dot) > (0.98 if normals == "gradient" else 0.9)

    def test_against_analytic_sphere(self):
        K, vol, T_wc, gt, norm, W, H = _scene((0.2, 0.3, 0.0))
        T_cw = se3.inverse(T_wc)
        vol1 = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        d, n, _ = sep.raycast_sdf_separable(vol1, T_wc, K, W, H, near=0.5,
                                            far=8.0, trunc_dist=0.15)
        b = np.asarray(d)
        g = np.asarray(gt)
        m = np.isfinite(b) & np.isfinite(g)
        assert m.sum() > 300
        assert np.median(np.abs(b[m] - g[m])) < 0.01  # < 0.2 voxel

    def test_empty_volume_all_misses(self):
        K, vol, T_wc, gt, norm, W, H = _scene()
        d, n, _ = sep.raycast_sdf_separable(vol.reset(jnp.nan), T_wc, K, W, H,
                                            near=0.5, far=8.0, trunc_dist=0.15)
        assert not np.isfinite(np.asarray(d)).any()


class TestCloudOutput:
    """raycast_sdf_separable(output='cloud') — the ICP fast path."""

    def test_cloud_points_lie_on_surface(self):
        K, vol, T_wc, gt, norm, W, H = _scene((0.2, 0.3, 0.0))
        T_cw = se3.inverse(T_wc)
        vol1 = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        d, vbo, n4 = sep.raycast_sdf_separable(
            vol1, T_wc, K, W, H, near=0.5, far=8.0, trunc_dist=0.15,
            output="cloud")
        assert vbo.shape == (H, W, 4) and n4.shape == (H, W, 4)
        P_c = np.asarray(vbo)[..., :3]
        ok = np.isfinite(P_c[..., 2])
        assert ok.sum() > 300
        # camera-space points, transformed to world, must lie on the sphere
        P_w = np.asarray(se3.transform(T_wc, jnp.asarray(P_c[ok])))
        r = np.linalg.norm(P_w, axis=-1)
        assert np.median(np.abs(r - 0.9)) < 0.02  # < 0.4 voxel

    def test_cloud_normals_face_camera(self):
        K, vol, T_wc, gt, norm, W, H = _scene((0.0, 0.0, 0.0))
        T_cw = se3.inverse(T_wc)
        vol1 = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        _, vbo, n4 = sep.raycast_sdf_separable(
            vol1, T_wc, K, W, H, near=0.5, far=8.0, trunc_dist=0.15,
            output="cloud")
        n = np.asarray(n4)
        ok = n[..., 3] == 1.0
        nz = n[ok][:, 2]
        fin = np.isfinite(nz)
        # camera looks along +z: visible surface normals point back (-z)
        assert (nz[fin] < 0).mean() > 0.9


class TestFuseEnableGate:
    def test_enable_false_is_bit_exact_passthrough(self):
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        vol1 = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1)
        out = sep.sdf_fuse_separable(vol1, gt, norm, T_cw, K, 0.15, 1000.0,
                                     0.1, enable=jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(out.val), np.asarray(vol1.val))
        np.testing.assert_array_equal(np.asarray(out.weight),
                                      np.asarray(vol1.weight))

    def test_enable_true_matches_ungated(self):
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        a = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        b = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1,
                                   enable=jnp.asarray(True))
        np.testing.assert_array_equal(np.asarray(a.val), np.asarray(b.val))


class TestPallasFuse:
    """separable_pallas.fuse_planes_pallas (interpret mode) vs the XLA scan."""

    @pytest.mark.parametrize("angles", POSES)
    def test_matches_xla_scan(self, angles, monkeypatch):
        from kangaroo_tpu import backend
        from kangaroo_tpu.fusion import separable_pallas as sp
        from jax.experimental import pallas as pl

        K, vol, T_wc, gt, norm, W, H = _scene(angles)
        T_cw = se3.inverse(T_wc)
        want = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1)

        real_call = pl.pallas_call
        jax.clear_caches()  # the jitted fuse is cached from the un-patched
        # call above; without this the patched (interpret) kernel is never
        # traced and the test compares the cached XLA result to itself
        monkeypatch.setenv("KANGAROO_PALLAS_FUSE", "1")
        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        monkeypatch.setattr(
            sp.pl, "pallas_call",
            lambda *a, **k: real_call(*a, interpret=True, **k))
        got = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                     0.1)
        np.testing.assert_allclose(np.asarray(got.val), np.asarray(want.val),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.weight),
                                   np.asarray(want.weight), atol=1e-4)

    def test_near_far_crop_falls_through_to_xla(self, monkeypatch):
        """The opt-in Pallas fuse has no plane window: when the knear/kfar
        ROI crop is requested it must fall through to the XLA twin so the
        two engines stay identical (the crop is NOT bit-equal to the full
        sweep — that is its point)."""
        from kangaroo_tpu import backend
        from kangaroo_tpu.fusion import separable_pallas as sp
        from jax.experimental import pallas as pl

        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        far = float(np.nanmedian(np.asarray(gt)))  # crop half the surface
        want = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1, far=far)
        full = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1)
        assert not np.array_equal(np.asarray(want.weight),
                                  np.asarray(full.weight)), \
            "far crop chosen too loose to exercise the gate"

        real_call = pl.pallas_call
        jax.clear_caches()
        monkeypatch.setenv("KANGAROO_PALLAS_FUSE", "1")
        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        monkeypatch.setattr(
            sp.pl, "pallas_call",
            lambda *a, **k: real_call(*a, interpret=True, **k))
        got = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                     0.1, far=far)
        np.testing.assert_array_equal(np.asarray(got.val),
                                      np.asarray(want.val))
        np.testing.assert_array_equal(np.asarray(got.weight),
                                      np.asarray(want.weight))

    def test_enable_gate_passthrough(self, monkeypatch):
        from kangaroo_tpu import backend
        from kangaroo_tpu.fusion import separable_pallas as sp
        from jax.experimental import pallas as pl

        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        real_call = pl.pallas_call
        jax.clear_caches()  # the jitted fuse is cached from the un-patched
        # call above; without this the patched (interpret) kernel is never
        # traced and the test compares the cached XLA result to itself
        monkeypatch.setenv("KANGAROO_PALLAS_FUSE", "1")
        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        monkeypatch.setattr(
            sp.pl, "pallas_call",
            lambda *a, **k: real_call(*a, interpret=True, **k))
        v1 = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        out = sep.sdf_fuse_separable(v1, gt, norm, T_cw, K, 0.15, 1000.0, 0.1,
                                     enable=jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(out.val), np.asarray(v1.val))


class TestClipPlanes:
    """Frustum-ROI plane window (the reference's per-frame SubBoundingVolume
    crop, kinectfusion/main.cpp:345-357): bit-equal to the full sweep, and
    the window genuinely shrinks when the camera sees a near wall."""

    @pytest.mark.parametrize("angles", POSES)
    def test_bit_equal_full_sweep(self, angles):
        K, vol, T_wc, gt, norm, W, H = _scene(angles)
        T_cw = se3.inverse(T_wc)
        full = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1, clip_planes=False)
        clip = sep.sdf_fuse_separable(vol, gt, norm, T_cw, K, 0.15, 1000.0,
                                      0.1, clip_planes=True)
        np.testing.assert_array_equal(np.asarray(full.val), np.asarray(clip.val))
        np.testing.assert_array_equal(np.asarray(full.weight),
                                      np.asarray(clip.weight))

    def _wall_scene(self):
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        vol = kt.TsdfVolume.create(48, 40, 64, bbox, trunc_dist=0.15)
        T_wc = se3.make(np.eye(3), [0.0, 0.0, -3.0])
        depth = jnp.full((H, W), 2.0)  # flat wall at world z = -1.0
        norm = jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0, 1.0], jnp.float32), (H, W, 4))
        return K, vol, jnp.asarray(T_wc), depth, norm

    def test_depth_bound_shrinks_window(self):
        K, vol, T_wc, depth, norm = self._wall_scene()
        T_cw = se3.inverse(T_wc)
        visible = np.asarray(sep.fuse_plane_window(
            vol, depth, norm, T_cw, K, 0.15, 0.1, sweep_axis=0))
        D = vol.d
        # far bound = dmax + trunc/minct = 2.0 + 1.5 = 3.5 camera depth
        # -> world z > 0.5 skipped: >25% of the 64 planes
        assert visible.sum() <= 0.78 * D
        assert visible[: D // 2].all()  # near planes all stay
        # and the clipped fuse is still bit-equal
        full = sep.sdf_fuse_separable(vol, depth, norm, T_cw, K, 0.15,
                                      1000.0, 0.1, clip_planes=False,
                                      sweep_axis=0)
        clip = sep.sdf_fuse_separable(vol, depth, norm, T_cw, K, 0.15,
                                      1000.0, 0.1, clip_planes=True,
                                      sweep_axis=0)
        np.testing.assert_array_equal(np.asarray(full.val), np.asarray(clip.val))
        np.testing.assert_array_equal(np.asarray(full.weight),
                                      np.asarray(clip.weight))

    def test_near_far_roi_crop(self):
        # the knear/kfar semantic crop: planes outside [near, far] camera
        # depth pass through untouched; planes inside match the full fuse
        K, vol, T_wc, depth, norm = self._wall_scene()
        T_cw = se3.inverse(T_wc)
        full = sep.sdf_fuse_separable(vol, depth, norm, T_cw, K, 0.15,
                                      1000.0, 0.1, clip_planes=False,
                                      sweep_axis=0)
        crop = sep.sdf_fuse_separable(vol, depth, norm, T_cw, K, 0.15,
                                      1000.0, 0.1, clip_planes=True,
                                      sweep_axis=0, near=1.95, far=2.6)
        # camera depth of plane k: 1.8 + 2.4*k/63; inside [1.95, 2.6]
        # (with batch granularity P=8) everything matches the full fuse
        zc = 1.8 + 2.4 * np.arange(vol.d) / (vol.d - 1)
        inside = (zc >= 1.95) & (zc <= 2.6)
        fv, cv = np.asarray(full.val), np.asarray(crop.val)
        np.testing.assert_array_equal(cv[inside], fv[inside])
        # fully-outside batches are untouched (== the reset state)
        v0 = np.asarray(vol.val)
        batch = 8
        touched = np.zeros(vol.d, bool)
        vis = (zc >= 1.95 - 2.4 / 63) & (zc <= 2.6)  # window granularity
        kk = np.where(vis)[0]
        touched[(kk.min() // batch) * batch:(kk.max() // batch + 1) * batch] = True
        np.testing.assert_array_equal(cv[~touched], v0[~touched])

    def test_sub_volume_roundtrip_fuse(self):
        # SubBoundingVolume parity: fuse a frustum sub-volume with the exact
        # engine and write it back; inside the block it matches the full fuse
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        full = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        from kangaroo_tpu.containers.bbox import fit_to_frustum

        roi = fit_to_frustum(K, W, H, np.asarray(T_wc), 1.8, 3.2)
        sub, org = vol.sub_volume(roi)
        fused = sdf_mod.sdf_fuse(sub, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        back = vol.with_sub_volume(fused, org)
        z0, y0, x0 = org
        sl = np.s_[z0:z0 + sub.d, y0:y0 + sub.h, x0:x0 + sub.w]
        np.testing.assert_allclose(np.asarray(back.val)[sl],
                                   np.asarray(full.val)[sl], atol=2e-4)
        # outside the block nothing was written
        mask = np.ones(vol.val.shape, bool)
        mask[sl] = False
        np.testing.assert_array_equal(np.asarray(back.val)[mask],
                                      np.asarray(vol.val)[mask])

    def test_raycast_clip_bit_equal(self):
        # the raycast's frustum plane window must be bit-equal to the full
        # sweep (invisible planes produce no crossings)
        K, vol, T_wc, gt, norm, W, H = _scene()
        T_cw = se3.inverse(T_wc)
        v1 = sdf_mod.sdf_fuse(vol, gt, norm, T_cw, K, 0.15, 1000.0, 0.1)
        for nf in ((0.5, 8.0), (2.0, 2.6)):
            d_full, n_full, _ = sep.raycast_sdf_separable(
                v1, T_wc, K, W, H, near=nf[0], far=nf[1], trunc_dist=0.15,
                sweep_axis=0, clip_planes=False)
            d_clip, n_clip, _ = sep.raycast_sdf_separable(
                v1, T_wc, K, W, H, near=nf[0], far=nf[1], trunc_dist=0.15,
                sweep_axis=0, clip_planes=True)
            np.testing.assert_array_equal(np.asarray(d_full), np.asarray(d_clip))
            np.testing.assert_array_equal(np.asarray(n_full), np.asarray(n_clip))
