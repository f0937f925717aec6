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
    # H=16: one whole block; H=256: multi-block row grid (R=128); H=20: no
    # multiple-of-8 divisor -> whole-image fallback block
    @pytest.mark.parametrize("sd", [-1, 1])
    @pytest.mark.parametrize("H", [16, 256, 20])
    def test_matches(self, interpret, rng, sd, H):
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import lr_pallas as lp

        W = 128
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


class TestSgmCarrySegments:
    @pytest.mark.parametrize("mask_mode", ["left", "right"])
    def test_chained_segments_equal_single(self, interpret, rng, mask_mode):
        """Two carry-chained row segments aggregate bit-identically to one
        full-height pass (the sharded wavefront's cross-shard contract)."""
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W = 8, 32, 128
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        whole, _, _, _ = sp.sgm_aggregate_block(vol, img, 0.01, 0.02,
                                                mask_mode, width=W)
        top, cp, cb, li = sp.sgm_aggregate_block(vol[:, :16], img[:16],
                                                 0.01, 0.02, mask_mode,
                                                 width=W)
        bot, _, _, _ = sp.sgm_aggregate_block(vol[:, 16:], img[16:],
                                              0.01, 0.02, mask_mode,
                                              width=W, seed=False,
                                              carry_prev=cp, carry_best=cb,
                                              last_img=li)
        got = np.concatenate([np.asarray(top), np.asarray(bot)], axis=1)
        np.testing.assert_array_equal(got, np.asarray(whole))

    def test_block_matches_xla_scan_carry(self, interpret, rng):
        """The Pallas segment kernel matches sgm._scan_direction's
        carry_in/return_carry path (the XLA wavefront twin)."""
        from kangaroo_tpu.stereo import sgm as sgm_mod
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W = 8, 16, 128
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        d = jnp.arange(D)[None, None, :]
        x = jnp.arange(W)[None, :, None]
        dmask = jnp.broadcast_to(d <= x, (H, W, D))
        v_lnd = jnp.moveaxis(vol, 0, -1)  # (H, W, D)
        lr1, fin = sgm_mod._scan_direction(v_lnd[:8], img[:8], dmask[:8],
                                           0.01, 0.02, reverse=False,
                                           return_carry=True)
        lr2 = sgm_mod._scan_direction(v_lnd[8:], img[8:], dmask[8:],
                                      0.01, 0.02, reverse=False,
                                      carry_in=fin)
        want = np.moveaxis(np.concatenate([np.asarray(lr1), np.asarray(lr2)],
                                          axis=0), -1, 0)
        top, cp, cb, li = sp.sgm_aggregate_block(vol[:, :8], img[:8],
                                                 0.01, 0.02, "left", width=W)
        bot, _, _, _ = sp.sgm_aggregate_block(vol[:, 8:], img[8:], 0.01, 0.02,
                                              "left", width=W, seed=False,
                                              carry_prev=cp, carry_best=cb,
                                              last_img=li)
        got = np.concatenate([np.asarray(top), np.asarray(bot)], axis=1)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestDtamPallas:
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_whole_solve_matches_xla_loop(self, interpret, rng, dtype):
        """The VMEM-resident DTAM kernel matches the XLA fori_loop twin
        (apps.stereo.dtam_solve) op for op."""
        from kangaroo_tpu.apps import stereo as stereo_app
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import dispatch as fast
        from kangaroo_tpu.stereo import dtam_pallas

        D, H, W = 8, 16, 128
        vol = jnp.asarray(
            (rng.integers(0, 257, (D, H, W)) / 256.0).astype(np.float32))
        vol = vol.astype(dtype)
        img = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
        lam, th0, sq, sdt, al, be = 20.0, 100.0, 0.7, 0.7, 0.002, 1e-5
        want = np.asarray(stereo_app.dtam_solve(
            vol, img, lam, th0, sq, sdt, al, be, 1.0, 2.5, iterations=6))
        g = cv.exponential_edge_weight(img / 255.0, 1.0, 2.5)
        d0 = fast.cost_vol_minimum_subpix(vol, -1)
        got = np.asarray(dtam_pallas.dtam_solve(
            vol, g, d0, lam, th0, sq, sdt, al, be, iterations=6))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSgmStackedSeams:
    def test_stacked_frames_equal_per_frame(self, interpret, rng):
        """seam_period re-seeds paths at frame boundaries: a stacked batch
        aggregates bit-identically to per-frame runs."""
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W, B = 8, 16, 128, 2
        vols = jnp.asarray(rng.random((B, D, H, W)).astype(np.float32))
        imgs = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
        per = [np.asarray(sp.semi_global_matching(vols[k], imgs[k], 0.01, 0.02))
               for k in range(B)]
        stacked = np.asarray(sp.semi_global_matching(
            jnp.concatenate(list(vols), axis=1),
            jnp.concatenate(list(imgs), axis=0),
            0.01, 0.02, seam_period=H))
        for k in range(B):
            np.testing.assert_array_equal(stacked[:, k * H:(k + 1) * H], per[k])

    def test_batched_pipeline_matches_per_frame(self, interpret, rng,
                                                monkeypatch):
        from kangaroo_tpu import backend
        from kangaroo_tpu.apps import stereo_sgm, synthetic

        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        jax.clear_caches()
        B, W, H, D = 2, 96, 64, 16
        ls, rs = [], []
        for k in range(B):
            l, r, _ = synthetic.stereo_pair(W, H, D, seed=k)
            ls.append(l)
            rs.append(r)
        lefts = jnp.stack(ls)
        rights = jnp.stack(rs)
        cfg = stereo_sgm.SgmConfig(max_disp=D, census_window="9x7")
        got = np.asarray(stereo_sgm.sgm_pipeline_batched(lefts, rights, cfg))
        for k in range(B):
            want = np.asarray(stereo_sgm.sgm_pipeline(ls[k], rs[k], cfg))
            a, b = got[k], want
            nan = np.isnan(a) & np.isnan(b)
            assert (nan | (np.abs(a - b) < 1e-4)).all()
