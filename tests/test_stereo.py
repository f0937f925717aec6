"""Stereo stack vs golden NumPy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

import reference_impl as ref
from kangaroo_tpu.stereo import census as census_mod
from kangaroo_tpu.stereo import costvolume as cv
from kangaroo_tpu.stereo import sgm as sgm_mod
from kangaroo_tpu.ops import median as median_mod
from kangaroo_tpu.geometry import depth as depth_mod


@pytest.fixture
def pair(rng):
    """A small synthetic stereo pair: right = left shifted by known disparity."""
    H, W = 24, 40
    left = (rng.random((H, W)) * 255).astype(np.float32)
    return left


class TestCensus:
    @pytest.mark.parametrize("window", ["9x7", "11x11", "16x16"])
    def test_census_matches_golden(self, rng, window):
        img = (rng.random((12, 16)) * 255).astype(np.uint8)
        offsets, n_words, _ = ref.census_offsets(window)
        want = ref.census(img, offsets, n_words)
        got = np.asarray(census_mod.census(jnp.asarray(img), window))
        np.testing.assert_array_equal(got, want)

    def test_hamming(self, rng):
        a = rng.integers(0, 2**32, (5, 5, 2), dtype=np.uint32)
        b = rng.integers(0, 2**32, (5, 5, 2), dtype=np.uint32)
        got = np.asarray(census_mod.hamming_distance(jnp.asarray(a), jnp.asarray(b)))
        want = np.array(
            [[ref.hamming(a[y, x], b[y, x]) for x in range(5)] for y in range(5)]
        )
        np.testing.assert_array_equal(got, want)

    def test_cost_volume_matches_golden(self, rng):
        img_l = (rng.random((10, 14)) * 255).astype(np.uint8)
        img_r = np.roll(img_l, 2, axis=1)
        cl = census_mod.census(jnp.asarray(img_l), "9x7")
        cr = census_mod.census(jnp.asarray(img_r), "9x7")
        got = np.asarray(census_mod.census_cost_volume(cl, cr, 6, -1))
        want = ref.census_cost_volume(np.asarray(cl), np.asarray(cr), 6, -1, 64)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_census_stereo_recovers_shift(self, rng):
        img_l = (rng.random((20, 40)) * 255).astype(np.float32)
        shift = 3
        img_r = np.roll(img_l, -shift, axis=1)  # right = left shifted left -> disp=+3
        cl = census_mod.census(jnp.asarray(img_l), "9x7")
        cr = census_mod.census(jnp.asarray(img_r), "9x7")
        disp = np.asarray(census_mod.census_stereo(cl, cr, 8))
        inner = disp[8:-8, 12:-12]
        frac = (inner == shift).mean()
        assert frac > 0.9


class TestWTA:
    def test_cost_vol_minimum_matches_golden(self, rng):
        vol = rng.random((8, 6, 12)).astype(np.float32)
        got = np.asarray(cv.cost_vol_minimum(jnp.asarray(vol), 8))
        want = ref.cost_vol_minimum(vol, 8)
        np.testing.assert_array_equal(got, want)

    def test_subpix_matches_golden(self, rng):
        vol = rng.random((8, 6, 12)).astype(np.float32)
        got = np.asarray(cv.cost_vol_minimum_subpix(jnp.asarray(vol), -1))
        want = ref.cost_vol_minimum_subpix(vol, -1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_subpix_exact_parabola(self):
        # cost = (d - 2.3)^2 has exact subpixel minimum at 2.3
        D, H, W = 6, 2, 8
        d = np.arange(D, dtype=np.float32)[:, None, None]
        vol = np.broadcast_to((d - 2.3) ** 2, (D, H, W)).copy()
        got = np.asarray(cv.cost_vol_minimum_subpix(jnp.asarray(vol), -1))
        np.testing.assert_allclose(got[:, 3:-1], 2.3, atol=1e-5)

    def test_square_penalty(self, rng):
        vol = rng.random((8, 6, 12)).astype(np.float32)
        lastd = (rng.random((6, 12)) * 7).astype(np.float32)
        out = np.asarray(
            cv.cost_vol_minimum_square_penalty_subpix(
                jnp.asarray(vol), jnp.asarray(lastd), 2.0, 0.5, -1
            )
        )
        want = ref.cost_vol_minimum_square_penalty_subpix(vol, lastd, 2.0, 0.5, -1)
        np.testing.assert_allclose(out, want, atol=1e-4)


class TestLRCheckMedianDepth:
    def test_lr_check_matches_golden(self, rng):
        H, W = 8, 16
        disp_l = (rng.random((H, W)) * 6).astype(np.float32)
        disp_r = disp_l + rng.normal(0, 0.3, (H, W)).astype(np.float32)
        got = np.asarray(
            cv.left_right_check(jnp.asarray(disp_l), jnp.asarray(disp_r), -1, 0.25)
        )
        want = ref.left_right_check(disp_l, disp_r, -1, 0.25)
        np.testing.assert_allclose(got, want, equal_nan=True, atol=1e-6)

    def test_median_reject_matches_golden(self, rng):
        img = (rng.random((10, 12)) * 5).astype(np.float32)
        img[rng.random((10, 12)) < 0.2] = np.nan
        got = np.asarray(median_mod.median_filter_reject_invalid(jnp.asarray(img), 13, 2))
        want = ref.median_reject_invalid(img, 13, 2)
        np.testing.assert_allclose(got, want, equal_nan=True)

    def test_median_plain(self, rng):
        img = rng.random((9, 9)).astype(np.float32)
        got = np.asarray(median_mod.median_filter_3x3(jnp.asarray(img)))
        # interior only (borders differ from scipy's modes)
        import itertools

        for y, x in itertools.product(range(1, 8), range(1, 8)):
            want = np.median(img[y - 1 : y + 2, x - 1 : x + 2])
            assert got[y, x] == pytest.approx(want)

    def test_disp_to_depth(self):
        disp = jnp.array([[2.0, 0.5, 0.0]])
        depth = depth_mod.disp_to_depth(disp, 100.0, 0.1, 0.4)
        np.testing.assert_allclose(np.asarray(depth[0, 0]), 5.0)
        assert np.isnan(np.asarray(depth[0, 2]))

    def test_depth_to_vbo_and_normals(self):
        from kangaroo_tpu import Intrinsics

        K = Intrinsics.centered(50.0, 16, 12)
        depth = jnp.full((12, 16), 2.0)
        vbo = depth_mod.depth_to_vbo(depth, K)
        assert vbo.shape == (12, 16, 4)
        np.testing.assert_allclose(np.asarray(vbo[..., 2]), 2.0)
        n = depth_mod.normals_from_vbo(vbo)
        # flat plane facing camera: normal = (0, 0, -1)
        np.testing.assert_allclose(np.asarray(n[3, 3, :3]), [0, 0, -1], atol=1e-5)


class TestSGM:
    def test_single_direction_matches_golden(self, rng):
        D, H, W = 6, 8, 10
        vol = rng.random((D, H, W)).astype(np.float32)
        img = rng.random((H, W)).astype(np.float32)
        for (dohoriz, dovert, dorev), dirs in [
            ((False, True, False), [(0, 1)]),
            ((False, True, True), [(0, 1), (0, -1)]),
            ((True, False, False), [(1, 0)]),
            ((True, False, True), [(1, 0), (-1, 0)]),
            ((True, True, True), [(0, 1), (0, -1), (1, 0), (-1, 0)]),
        ]:
            got = np.asarray(
                sgm_mod.semi_global_matching(
                    jnp.asarray(vol), jnp.asarray(img), 0.01, 0.02,
                    do_horiz=dohoriz, do_vert=dovert, do_reverse=dorev,
                )
            )
            want = ref.sgm_aggregate(vol, img, 0.01, 0.02, dirs)
            # compare only valid lattice entries (d <= x)
            d_idx = np.arange(D)[:, None, None]
            x_idx = np.arange(W)[None, None, :]
            m = np.broadcast_to(d_idx <= x_idx, (D, H, W))
            np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5,
                                       err_msg=f"dirs={dirs}")

    def test_eight_path_matches_golden(self, rng):
        D, H, W = 6, 8, 10
        vol = rng.random((D, H, W)).astype(np.float32)
        img = rng.random((H, W)).astype(np.float32)
        got = np.asarray(
            sgm_mod.semi_global_matching(
                jnp.asarray(vol), jnp.asarray(img), 0.01, 0.02, do_diagonal=True
            )
        )
        dirs = [(0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (-1, 1), (1, -1), (-1, -1)]
        want = ref.sgm_aggregate(vol, img, 0.01, 0.02, dirs)
        d_idx = np.arange(D)[:, None, None]
        x_idx = np.arange(W)[None, None, :]
        m = np.broadcast_to(d_idx <= x_idx, (D, H, W))
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5)

    def test_sgm_improves_noisy_wta(self, rng):
        # piecewise-constant disparity scene with noisy costs: SGM should
        # produce a smoother, more accurate WTA result
        D, H, W = 8, 24, 32
        true_d = np.full((H, W), 2)
        true_d[:, 20:] = 5
        d = np.arange(D)[:, None, None]
        vol = (d != true_d[None]).astype(np.float32)
        vol += rng.normal(0, 0.45, vol.shape).astype(np.float32)
        img = np.ones((H, W), np.float32)
        agg = sgm_mod.semi_global_matching(jnp.asarray(vol), jnp.asarray(img), 0.2, 1.0)
        wta_raw = np.asarray(cv.cost_vol_minimum(jnp.asarray(vol), D))
        wta_sgm = np.asarray(cv.cost_vol_minimum(agg, D))
        inner = np.s_[:, 8:]
        err_raw = (wta_raw[inner] != true_d[inner]).mean()
        err_sgm = (wta_sgm[inner] != true_d[inner]).mean()
        assert err_sgm < err_raw


class TestPipeline:
    def test_stereo_slice_end_to_end(self, rng):
        """census -> volume -> WTA subpix -> median -> LR-check -> depth."""
        H, W, D = 32, 48, 12
        shift = 4
        base = (rng.random((H, W + shift)) * 255).astype(np.float32)
        img_l = base[:, :-shift]
        img_r = base[:, shift:]  # left[x] = right[x - shift]: disparity = +shift
        cl = census_mod.census(jnp.asarray(img_l), "9x7")
        cr = census_mod.census(jnp.asarray(img_r), "9x7")
        vol_l = census_mod.census_cost_volume(cl, cr, D, -1)
        vol_r = census_mod.census_cost_volume(cr, cl, D, 1)
        disp_l = cv.cost_vol_minimum_subpix(vol_l, -1)
        disp_r = cv.cost_vol_minimum_subpix(vol_r, 1)
        disp_l = median_mod.median_filter_reject_invalid(disp_l, 13, 2)
        disp = cv.left_right_check(disp_l, disp_r, -1, 1.0)
        inner = np.asarray(disp)[8:-8, 12:-12]
        valid = np.isfinite(inner)
        assert valid.mean() > 0.8
        assert np.abs(inner[valid] - shift).mean() < 0.5


class TestReanchorRight:
    def test_matches_gather_semantics(self, rng):
        """aggR[d, y, x] = aggL[d, y, x + d] on the in-range lattice (the
        wrapped lanes x + d >= W are rejected downstream by _xr_valid)."""
        D, H, W = 8, 6, 12
        agg = rng.random((D, H, W)).astype(np.float32)
        got = np.asarray(cv.reanchor_right(jnp.asarray(agg)))
        for d in range(D):
            for x in range(W - d):
                np.testing.assert_array_equal(got[d, :, x], agg[d, :, x + d])
