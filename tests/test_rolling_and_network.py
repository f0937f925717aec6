"""Rolling TSDF volume (LocalTileGrid role) + sorting-network generator."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import rolling, sdf as sdf_mod
from kangaroo_tpu.utils import sorting_network as sn


class TestSortingNetwork:
    @pytest.mark.parametrize("n", [3, 5, 8, 9, 25])
    def test_sorts_and_medians(self, n, rng):
        vals = [jnp.asarray(rng.random((6, 7)).astype(np.float32))
                for _ in range(n)]
        stacked = np.stack([np.asarray(v) for v in vals])
        got = np.stack([np.asarray(v) for v in sn.sort_stack(vals)])
        np.testing.assert_array_equal(got, np.sort(stacked, axis=0))
        med = np.asarray(sn.median_of_stack(vals))
        np.testing.assert_array_equal(med, np.median(stacked, axis=0)
                                      if n % 2 == 1 else
                                      np.sort(stacked, axis=0)[n // 2])

    def test_median_network_is_pruned(self):
        assert len(sn.median_swaps(25)) < len(sn.bitonic_swaps(25))


class TestRollingVolume:
    def _vol(self):
        bbox = kt.BoundingBox.create((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        vol = kt.TsdfVolume.create(16, 16, 16, bbox, trunc_dist=0.2)
        return sdf_mod.sdf_sphere(vol, (0.0, 0.0, 0.0), 0.6)

    def test_world_geometry_invariant_under_roll(self):
        vol = self._vol()
        rolled = rolling.roll_volume(vol, (3, -2, 4), reset_val=jnp.nan)
        # sample the SDF at world points inside BOTH windows
        pts = np.array([[0.0, 0.0, 0.61], [0.3, 0.1, 0.1], [-0.2, 0.3, 0.2]],
                       np.float32)
        a = np.asarray(vol.as_bounded().sample_trilinear_world(jnp.asarray(pts)))
        b = np.asarray(rolled.as_bounded().sample_trilinear_world(jnp.asarray(pts)))
        np.testing.assert_allclose(a, b, atol=1e-5)
        # bbox translated by shift * voxel size
        step = np.asarray(vol.voxel_size_units())
        np.testing.assert_allclose(
            np.asarray(rolled.bbox.lo - vol.bbox.lo),
            step * np.array([3, -2, 4]), atol=1e-6)

    def test_vacated_region_is_reset(self):
        vol = self._vol()
        rolled = rolling.roll_volume(vol, (5, 0, 0))
        w = np.asarray(rolled.weight)
        assert (w[:, :, -5:] == 0).all()      # new +x slabs unobserved
        assert (w[:, :, :-5] > 0).any()
        assert np.isnan(np.asarray(rolled.val)[:, :, -5:]).all()

    def test_follow_camera_hysteresis(self):
        vol = self._vol()
        # camera near the centre: no roll
        T = se3.make(np.eye(3), [0.05, 0.0, -0.45])
        assert rolling.recenter_shift(vol, T, lead=0.5) == (0, 0, 0)
        same = rolling.follow_camera(vol, T)
        assert same is vol
        # camera far off-centre: rolls toward it
        T2 = se3.make(np.eye(3), [2.0, 0.0, -0.5])
        moved = rolling.follow_camera(vol, T2, threshold_voxels=2)
        assert float(moved.bbox.lo[0]) > float(vol.bbox.lo[0])


class TestRollBoundedVolume:
    def test_follows_tsdf_roll(self, rng):
        """The colour volume must roll with the SAME whole-voxel shift as
        its paired TSDF: identical bbox translation, identical content
        movement, vacated slabs reset to 0.5."""
        D, H, W = 8, 6, 10
        bbox = kt.BoundingBox.create((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        cdata = rng.random((D, H, W)).astype(np.float32)
        bv = kt.BoundedVolume(jnp.asarray(cdata), bbox)
        vol = kt.TsdfVolume(jnp.asarray(rng.random((D, H, W)).astype(np.float32)),
                            jnp.ones((D, H, W), jnp.float32), bbox)
        shift = (3, -2, 1)
        v2 = rolling.roll_volume(vol, shift)
        c2 = rolling.roll_bounded_volume(bv, shift)
        np.testing.assert_allclose(np.asarray(c2.bbox.lo),
                                   np.asarray(v2.bbox.lo), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c2.bbox.hi),
                                   np.asarray(v2.bbox.hi), rtol=1e-6)
        # reference: roll_volume itself, which TestRollingVolume pins
        # independently via world-space trilinear invariance — the colour
        # roll must move content exactly like a TSDF val plane whose
        # reset value is the colour reset (0.5)
        want = rolling.roll_volume(
            kt.TsdfVolume(jnp.asarray(cdata), jnp.ones((D, H, W)), bbox),
            shift, reset_val=0.5)
        np.testing.assert_array_equal(np.asarray(c2.data),
                                      np.asarray(want.val))
        # spot-check the world anchoring independently of both
        # implementations: a voxel value must stay at the same WORLD
        # position after the roll (interior, away from vacated slabs)
        # new[z, y, x] = old[z + sz, y + sy, x + sx] for shift (3, -2, 1)
        assert np.asarray(c2.data)[2, 3, 2] == cdata[3, 1, 5]
