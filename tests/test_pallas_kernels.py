"""Pallas TPU kernels vs their XLA twins.

On the CPU test mesh the Pallas kernels run in interpret mode (slow but
exact); on real TPU hardware they run compiled. Either way outputs must match
the portable XLA implementations bit-for-bit (all comparisons are
float32-exact by construction).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# force interpret mode for Pallas on CPU
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(scope="module")
def interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture
def small_vol(rng):
    D, H, W = 16, 16, 128
    vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    return vol, img


class TestSgmPallas:
    def test_matches_xla(self, interpret, small_vol):
        from kangaroo_tpu.stereo import sgm as sx
        from kangaroo_tpu.stereo import sgm_pallas as sp

        vol, img = small_vol
        a = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02))
        b = np.asarray(sp.semi_global_matching(vol, img, 0.01, 0.02))
        D, H, W = vol.shape
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        m = np.broadcast_to(d <= x, vol.shape)
        np.testing.assert_allclose(a[m], b[m], atol=1e-5)

    def test_eight_path_matches_xla(self, interpret, small_vol):
        from kangaroo_tpu.stereo import sgm as sx
        from kangaroo_tpu.stereo import sgm_pallas as sp

        vol, img = small_vol
        a = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02,
                                               do_diagonal=True))
        b = np.asarray(sp.semi_global_matching(vol, img, 0.01, 0.02,
                                               do_diagonal=True))
        D, H, W = vol.shape
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        m = np.broadcast_to(d <= x, vol.shape)
        np.testing.assert_allclose(a[m], b[m], atol=1e-5)

    def test_right_volume_mask(self, interpret, small_vol):
        from kangaroo_tpu.stereo import sgm as sx
        from kangaroo_tpu.stereo import sgm_pallas as sp

        vol, img = small_vol
        a = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02, sd=1))
        b = np.asarray(sp.semi_global_matching(vol, img, 0.01, 0.02, sd=1))
        D, H, W = vol.shape
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        m = np.broadcast_to(x + d < W, vol.shape)
        np.testing.assert_allclose(a[m], b[m], atol=1e-5)


class TestWtaPallas:
    def test_subpix_matches(self, interpret, small_vol):
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import wta_pallas as wp

        vol, _ = small_vol
        a = np.asarray(cv.cost_vol_minimum_subpix(vol, -1))
        b = np.asarray(wp.cost_vol_minimum_subpix(vol, -1))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_square_penalty_matches(self, interpret, small_vol, rng):
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import wta_pallas as wp

        vol, _ = small_vol
        last = jnp.asarray((rng.random(vol.shape[1:]) * vol.shape[0]).astype(np.float32))
        a = np.asarray(cv.cost_vol_minimum_square_penalty_subpix(vol, last, 2.0, 0.5, -1))
        b = np.asarray(wp.cost_vol_minimum_square_penalty_subpix(vol, last, 2.0, 0.5, -1))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestMedianPallas:
    def test_reject_matches(self, interpret, rng):
        from kangaroo_tpu.ops import median as mm
        from kangaroo_tpu.ops import median_pallas as mp

        img = rng.random((16, 128)).astype(np.float32) * 10
        img[rng.random((16, 128)) < 0.2] = np.nan
        a = np.asarray(mm.median_filter_reject_invalid(jnp.asarray(img), 12, 2))
        b = np.asarray(mp.median_filter(jnp.asarray(img), 12, 2, reject=True))
        np.testing.assert_allclose(a, b, equal_nan=True)

    def test_plain_matches(self, interpret, rng):
        from kangaroo_tpu.ops import median as mm
        from kangaroo_tpu.ops import median_pallas as mp

        img = jnp.asarray(rng.random((16, 128)).astype(np.float32))
        a = np.asarray(mm.median_filter_3x3(img))
        b = np.asarray(mp.median_filter(img, rad=1, reject=False))
        np.testing.assert_allclose(a, b)


class TestLrPallas:
    @pytest.mark.parametrize("sd", [-1, 1])
    def test_matches(self, interpret, rng, sd):
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import lr_pallas as lp

        H, W = 16, 128
        dl = rng.random((H, W)).astype(np.float32) * 15
        dl[rng.random((H, W)) < 0.1] = np.nan
        dr = dl + rng.normal(0, 0.6, (H, W)).astype(np.float32)
        a = np.asarray(cv.left_right_check(jnp.asarray(dl), jnp.asarray(dr), sd, 1.0))
        b = np.asarray(
            lp.left_right_check(jnp.asarray(dl), jnp.asarray(dr), sd, 1.0, max_disp=16)
        )
        np.testing.assert_allclose(a, b, equal_nan=True)


class TestSgmLaneOffset:
    def test_column_shard_offset_matches_xla(self, interpret, rng):
        """The lane_offset SMEM scalar (column-sharded callers) must shift
        the valid-disparity mask to absolute image x."""
        from kangaroo_tpu.stereo import sgm as sx
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W = 16, 16, 256
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        # full-image vertical aggregation as reference
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        dm = jnp.asarray(np.broadcast_to(d <= x, (D, H, W)).transpose(1, 2, 0))
        v_hwd = jnp.moveaxis(vol, 0, -1)
        ref = sx._scan_direction(v_hwd, img, dm, 0.01, 0.02, False)
        ref = ref + sx._scan_direction(v_hwd, img, dm, 0.01, 0.02, True)
        ref = np.asarray(jnp.moveaxis(ref, -1, 0))
        # column-sharded emulation: two halves with lane offsets
        halves = []
        for off in (0, W // 2):
            sl = vol[:, :, off:off + W // 2]
            im = img[:, off:off + W // 2]
            halves.append(np.asarray(sp.sgm_aggregate_scan(
                sl, im, 0.01, 0.02, True, "left", scan_is_x=False,
                width=W, lane_offset=off)))
        got = np.concatenate(halves, axis=2)
        m = np.broadcast_to(d <= x, (D, H, W))
        np.testing.assert_allclose(got[m], ref[m], atol=1e-5)
