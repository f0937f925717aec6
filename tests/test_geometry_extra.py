"""Patch scores, dense stereo, texturing, rectification, pose graph, se3 log."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.apps import synthetic
from kangaroo_tpu.core import patch_score, se3
from kangaroo_tpu.geometry import depth as depth_mod
from kangaroo_tpu.geometry import pose_graph, rectify
from kangaroo_tpu.stereo import costvolume as cv
from kangaroo_tpu.stereo import dense_stereo as ds
from kangaroo_tpu.solvers.photometric import kt_lr


class TestPatchScore:
    def test_sad_matches_manual(self, rng):
        a = rng.random((10, 12)).astype(np.float32)
        b = rng.random((10, 12)).astype(np.float32)
        s = np.asarray(patch_score.score_shifted(jnp.asarray(a), jnp.asarray(b), -2, 1, "sad"))
        y, x = 5, 6
        manual = sum(
            abs(a[y + r, x + c] - b[y + r, x + c - 2])
            for r in (-1, 0, 1)
            for c in (-1, 0, 1)
        )
        assert s[y, x] == pytest.approx(manual, rel=1e-5)

    def test_zero_mean_ignores_bias(self, rng):
        a = rng.random((10, 12)).astype(np.float32)
        b = a + 37.0  # constant intensity offset
        s = np.asarray(patch_score.score_shifted(jnp.asarray(a), jnp.asarray(b), 0, 1, "sand"))
        assert abs(s[4:-4, 4:-4]).max() < 1e-3
        s2 = np.asarray(patch_score.score_shifted(jnp.asarray(a), jnp.asarray(b), 0, 1, "sad"))
        assert s2[4:-4, 4:-4].min() > 100.0

    def test_pixel_and_ssd(self, rng):
        a = rng.random((8, 8)).astype(np.float32)
        b = rng.random((8, 8)).astype(np.float32)
        s = np.asarray(patch_score.score_shifted(jnp.asarray(a), jnp.asarray(b), 0, 0, "pixel"))
        np.testing.assert_allclose(s, (a - b) ** 2, rtol=1e-5)

    def test_ssnd_line_matches_reference_formula(self, rng):
        # SSNDLineScore (patch_score.h:211-255): the SSND quadratic over a
        # 1-row line with the reference's n = w*w normaliser quirk kept.
        a = rng.random((10, 16)).astype(np.float32)
        b = rng.random((10, 16)).astype(np.float32)
        rad = 2
        s = np.asarray(patch_score.score_shifted(
            jnp.asarray(a), jnp.asarray(b), 0, rad, "ssnd_line"))
        y, x = 5, 8
        w = 2 * rad + 1
        n = float(w * w)
        xs = a[y, x - rad:x + rad + 1].astype(np.float64)
        ys = b[y, x - rad:x + rad + 1].astype(np.float64)
        sxi, syi = xs.sum(), ys.sum()
        sxi2, syi2, sxiyi = (xs * xs).sum(), (ys * ys).sum(), (xs * ys).sum()
        mx, my = sxi / n, syi / n
        manual = (sxi2 - 2 * mx * sxi + n * mx * mx
                  + 2 * (-sxiyi + my * sxi + mx * syi - n * mx * my)
                  + syi2 - 2 * my * syi + n * my * my)
        assert s[y, x] == pytest.approx(manual, rel=1e-4, abs=1e-5)
        # a constant-bias partner is NOT fully cancelled under the n = w^2
        # quirk (only w/n of the bias is removed) — unlike true zero-mean
        sb = np.asarray(patch_score.score_shifted(
            jnp.asarray(a), jnp.asarray(a + 10.0), 0, rad, "ssnd_line"))
        expect = w * 10.0 ** 2 - (w * 10.0) ** 2 / n
        assert sb[5, 8] == pytest.approx(expect, rel=1e-4)


class TestDenseStereo:
    def test_recovers_disparity(self):
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        disp = np.asarray(ds.dense_stereo(left, right, 16, rad=2, kind="sad"))
        g = np.asarray(gt)
        m = disp >= 0
        m[:8] = m[-8:] = False
        m[:, :24] = m[:, -8:] = False
        err = np.abs(disp[m] - g[m])
        assert (err < 1).mean() > 0.9

    def test_subpixel_refine(self):
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        disp = ds.dense_stereo(left, right, 16, rad=2, kind="sad")
        sub = np.asarray(ds.dense_stereo_subpixel_refine(disp, left, right, rad=2, kind="sad"))
        g = np.asarray(gt)
        m = np.isfinite(sub)
        m[:8] = m[-8:] = False
        m[:, :24] = m[:, -8:] = False
        assert m.mean() > 0.2
        assert np.abs(sub[m] - g[m]).mean() < 0.75


class TestCostVolumeAdd:
    def test_self_view_zero_score(self, rng):
        K = kt.Intrinsics.centered(30.0, 32, 24)
        n, s = cv.cost_volume_zero(8, 24, 32)
        img = jnp.asarray(rng.random((24, 32)).astype(np.float32))
        KT = kt_lr(K, se3.identity())
        n2, s2 = cv.cost_volume_add(n, s, img, img, KT, K, 0.1, 1)
        mask = np.asarray(n2) > 0
        assert mask.any()
        assert np.abs(np.asarray(s2)[mask]).max() < 1e-4
        f = np.asarray(cv.cost_elem_to_float(n2, s2))
        assert (f[~mask] == 1e30).all()


class TestTexturing:
    def test_texture_depth_flat_plane(self):
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        depth = jnp.full((H, W), 2.0)
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)
        img = jnp.full((H, W), 200, jnp.uint8)
        out = np.asarray(
            depth_mod.texture_depth(depth, norm, img, K, se3.identity(), se3.identity(), K)
        )
        inner = out[4:-4, 4:-4]
        np.testing.assert_allclose(inner[..., 0], 200 / 255.0, atol=1e-3)

    def test_multi_keyframe(self):
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        depth = jnp.full((H, W), 2.0)
        vbo = depth_mod.depth_to_vbo(depth, K)
        norm = depth_mod.normals_from_vbo(vbo)
        phong = jnp.full((H, W), 0.5)
        kfs = [
            (jnp.full((H, W), 100, jnp.uint8), K, jnp.asarray(se3.identity())),
            (jnp.full((H, W), 200, jnp.uint8), K, jnp.asarray(se3.identity())),
        ]
        out = np.asarray(
            depth_mod.texture_depth_keyframes(depth, norm, phong, kfs, se3.identity(), K)
        )
        inner = out[4:-4, 4:-4, 0]
        np.testing.assert_allclose(inner, 150 / 255.0, atol=1e-2)


class TestSE3Log:
    def test_log_exp_roundtrip(self, rng):
        for _ in range(5):
            xi = jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32))
            back = se3.log(se3.exp(xi))
            np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)

    def test_log_identity(self):
        np.testing.assert_allclose(np.asarray(se3.log(se3.identity())), 0.0, atol=1e-7)


class TestPoseGraph:
    def test_loop_closure(self, rng):
        # chain of 4 poses with a loop-closure edge; noisy initialisation
        true = [np.asarray(se3.identity())]
        for k in range(3):
            xi = np.array([0.5, 0.0, 0.1 * k, 0.0, 0.0, 0.3], np.float32)
            true.append(np.asarray(se3.compose(jnp.asarray(true[-1]), se3.exp(jnp.asarray(xi)))))
        g = pose_graph.PoseGraph()
        for k, T in enumerate(true):
            noise = rng.normal(0, 0.05, 6).astype(np.float32) if k > 0 else np.zeros(6, np.float32)
            g.add_keyframe(np.asarray(se3.compose(jnp.asarray(T), se3.exp(jnp.asarray(noise)))))
        for k in range(3):
            T_ji = np.asarray(
                se3.compose(se3.inverse(jnp.asarray(true[k + 1])), jnp.asarray(true[k]))
            )
            g.add_relative_edge(k, k + 1, T_ji)
        # loop closure 0 -> 3
        T_30 = np.asarray(se3.compose(se3.inverse(jnp.asarray(true[3])), jnp.asarray(true[0])))
        g.add_relative_edge(0, 3, T_30)
        final = g.optimize(iterations=15)
        assert final < 1e-3
        for k in range(4):
            np.testing.assert_allclose(g.poses[k], true[k], atol=1e-2)

    def test_prior_anchors(self):
        g = pose_graph.PoseGraph()
        g.add_keyframe(np.asarray(se3.exp(jnp.asarray([0.3, 0, 0, 0, 0, 0.2]))))
        g.add_prior(0, np.asarray(se3.identity()))
        g.optimize(iterations=10, fix_first=False)
        np.testing.assert_allclose(g.poses[0], np.asarray(se3.identity()), atol=1e-3)

    def test_load_poses(self, tmp_path):
        p = tmp_path / "pose.txt"
        p.write_text("1 0 0 0 0 1 0 0 0 0 1 5\n0.1 0.2 0.3 0 0 0\n")
        poses = pose_graph.load_poses_from_file(str(p))
        assert len(poses) == 2
        assert poses[0][2, 3] == 5.0
        np.testing.assert_allclose(poses[1][:, 3], [0.1, 0.2, 0.3])


class TestRectify:
    def test_identity_rig_roundtrip(self, rng):
        # cameras already rectified: pure x-baseline -> lookups ~ identity
        W, H = 32, 24
        K = kt.Intrinsics.centered(30.0, W, H)
        T_rl = np.asarray(se3.make(np.eye(3), [-0.1, 0.0, 0.0]))
        lut_l, lut_r, T_nr_nl, R_nl = rectify.create_scanline_rectified_lookup(
            W, H, T_rl, K, K
        )
        v, u = np.mgrid[0:H, 0:W].astype(np.float32)
        # the reference clamps lookups to [1, dim-2]
        np.testing.assert_allclose(
            np.asarray(lut_l[..., 0]), np.clip(u, 1, W - 2), atol=1e-4
        )
        assert float(T_nr_nl[0, 3]) == pytest.approx(-0.1, abs=1e-6)

    def test_tilted_rig_rectifies(self):
        # right camera slightly rotated: after warping, epipolar lines must be
        # horizontal — verify by checking that a world point projects to the
        # same row in both rectified images
        W, H = 64, 48
        K = kt.Intrinsics.centered(50.0, W, H)
        R = np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0.02, 0.03, 0.01])))[:, :3]
        T_rl = np.asarray(se3.make(R, R @ np.array([-0.1, 0, 0], np.float32)))
        lut_l, lut_r, T_nr_nl, R_nl = rectify.create_scanline_rectified_lookup(
            W, H, T_rl, K, K
        )
        # project a world point into both original cameras, then map through
        # the homographies implied by the lookups (lookup: new->orig), i.e.
        # find the new-image pixel whose lookup hits the original projection
        P_l = np.array([0.2, -0.1, 3.0], np.float32)
        P_r = np.asarray(se3.transform(jnp.asarray(T_rl), jnp.asarray(P_l)))
        p_l = np.asarray(K.project(jnp.asarray(P_l)))
        p_r = np.asarray(K.project(jnp.asarray(P_r)))
        ll = np.asarray(lut_l)
        lr = np.asarray(lut_r)
        il = np.unravel_index(
            np.argmin((ll[..., 0] - p_l[0]) ** 2 + (ll[..., 1] - p_l[1]) ** 2), (H, W)
        )
        ir = np.unravel_index(
            np.argmin((lr[..., 0] - p_r[0]) ** 2 + (lr[..., 1] - p_r[1]) ** 2), (H, W)
        )
        assert abs(il[0] - ir[0]) <= 1  # same scanline
        assert rectify.baseline_from_t_rl(T_rl) == pytest.approx(0.1, rel=1e-5)
