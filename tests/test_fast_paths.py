"""Fast-path variants vs exact paths: NN fuse, guided raycast, lr_from_left,
frame-parallel batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.apps import stereo_sgm, synthetic
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import raycast as rc
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.geometry import depth as depth_mod
from kangaroo_tpu.parallel import batch as batch_mod
from kangaroo_tpu.parallel import mesh as mesh_mod


def _setup_scene():
    W, H = 64, 48
    K = kt.Intrinsics.centered(55.0, W, H)
    bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
    vol = kt.TsdfVolume.create(64, 64, 64, bbox, trunc_dist=0.15)
    vol = sdf_mod.sdf_sphere(vol, (0.0, 0.0, 0.0), 0.9)
    T_wc = jnp.asarray(se3.make(np.eye(3), [0.0, 0.0, -3.0]))
    return K, vol, T_wc, W, H


class TestFastFuse:
    def test_nn_fuse_close_to_bilinear(self):
        K, vol, T_wc, W, H = _setup_scene()
        T_cw = se3.inverse(T_wc)
        prev = jnp.full((H, W), jnp.nan)
        gt, _ = rc.raycast_sphere(prev, T_wc, K, (0.0, 0.0, 0.0), 0.9, W, H)
        vbo = depth_mod.depth_to_vbo(gt, K)
        norm = depth_mod.normals_from_vbo(vbo)
        base = kt.TsdfVolume.create(64, 64, 64, vol.bbox, trunc_dist=0.15)
        a = sdf_mod.sdf_fuse(base, gt, norm, T_cw, K, 0.15, sample="bilinear")
        b = sdf_mod.sdf_fuse(base, gt, norm, T_cw, K, 0.15, sample="nearest")
        both = (np.asarray(a.weight) > 0) & (np.asarray(b.weight) > 0)
        assert both.mean() > 0.05
        diff = np.abs(np.asarray(a.val) - np.asarray(b.val))[both]
        assert np.median(diff) < 0.01  # sub-voxel agreement

    def test_guided_raycast_close_to_full(self):
        K, vol, T_wc, W, H = _setup_scene()
        d_full, _, _ = rc.raycast_sdf(vol, T_wc, K, W, H, near=0.5, far=8.0,
                                      trunc_dist=0.15)
        d_guided, _, _ = rc.raycast_sdf_guided(vol, T_wc, K, W, H, near=0.5,
                                               far=8.0, trunc_dist=0.15)
        a, b = np.asarray(d_full), np.asarray(d_guided)
        both = np.isfinite(a) & np.isfinite(b)
        assert both.sum() > 0.85 * np.isfinite(a).sum()
        assert np.median(np.abs(a[both] - b[both])) < 0.02


class TestLrFromLeft:
    def test_close_to_two_volume_result(self):
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg_a = stereo_sgm.SgmConfig(max_disp=16, census_window="9x7", p1=0.03,
                                     p2=0.1)
        cfg_b = stereo_sgm.SgmConfig(max_disp=16, census_window="9x7", p1=0.03,
                                     p2=0.1, lr_from_left=True)
        da = np.asarray(stereo_sgm.sgm_pipeline(left, right, cfg_a))
        db = np.asarray(stereo_sgm.sgm_pipeline(left, right, cfg_b))
        g = np.asarray(gt)
        inner = np.zeros_like(g, bool)
        inner[8:-8, 20:-8] = True
        mb = np.isfinite(db) & inner
        assert mb.sum() / inner.sum() > 0.5
        assert np.median(np.abs(db[mb] - g[mb])) < 1.0


class TestFrameParallel:
    def test_batch_matches_single(self):
        assert jax.device_count() >= 8
        mesh = mesh_mod.make_mesh(8)
        cfg = stereo_sgm.SgmConfig(max_disp=8, census_window="9x7",
                                   lr_check=False, median_its=0)
        pairs = [synthetic.stereo_pair(64, 32, 8, seed=s) for s in range(8)]
        lb = jnp.stack([p[0] for p in pairs])
        rb = jnp.stack([p[1] for p in pairs])
        f = batch_mod.frame_parallel(
            lambda l, r: stereo_sgm.sgm_pipeline(l, r, cfg), mesh
        )
        out = f(lb, rb)
        assert out.shape == (8, 32, 64)
        single = stereo_sgm.sgm_pipeline(pairs[3][0], pairs[3][1], cfg)
        np.testing.assert_allclose(np.asarray(out[3]), np.asarray(single),
                                   equal_nan=True, atol=1e-5)
