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

    def test_block_acc_chaining(self, interpret, rng):
        """acc + carry_out together: the segment adds onto the aliased
        accumulator block (the wavefront's shared-chain contract) and the
        returned carry is unchanged by the chaining."""
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W = 8, 16, 128
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        acc = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        plain, cp, cb, li = sp.sgm_aggregate_block(vol, img, 0.01, 0.02,
                                                   "left", width=W)
        accd, cp2, cb2, li2 = sp.sgm_aggregate_block(vol, img, 0.01, 0.02,
                                                     "left", width=W,
                                                     acc=acc)
        np.testing.assert_allclose(np.asarray(accd) - np.asarray(acc),
                                   np.asarray(plain), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(cp), np.asarray(cp2))
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(cb2))

    @pytest.mark.parametrize("dx", [1, -1])
    def test_diag_chained_segments_equal_single(self, interpret, rng, dx):
        """Two carry-chained diagonal row segments aggregate identically to
        one full-height pass (the has-mask makes seed == continue)."""
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W = 8, 32, 128
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))

        def zero_carry():
            return (jnp.full((D, W), 1e30, jnp.float32),
                    jnp.zeros((W,), jnp.float32),
                    jnp.zeros((W,), jnp.float32),
                    jnp.zeros((W,), jnp.float32))

        cp0, cb0, li0, ch0 = zero_carry()
        whole, _, _, _, _ = sp.sgm_aggregate_diag_block(
            vol, img, cp0, cb0, ch0, li0, 0.01, 0.02, "left", dx=dx, width=W)
        top, cp, cb, li, ch = sp.sgm_aggregate_diag_block(
            vol[:, :16], img[:16], cp0, cb0, ch0, li0, 0.01, 0.02, "left",
            dx=dx, width=W)
        bot, _, _, _, _ = sp.sgm_aggregate_diag_block(
            vol[:, 16:], img[16:], cp, cb, ch, li, 0.01, 0.02, "left",
            dx=dx, width=W)
        got = np.concatenate([np.asarray(top), np.asarray(bot)], axis=1)
        np.testing.assert_array_equal(got, np.asarray(whole))

    @pytest.mark.parametrize("dx", [1, -1])
    def test_diag_block_matches_xla_scan_carry(self, interpret, rng, dx):
        """The Pallas diagonal segment kernel matches sgm._scan_diagonal's
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
        lr1, fin = sgm_mod._scan_diagonal(v_lnd[:8], img[:8], dmask[:8],
                                          0.01, 0.02, dx=dx,
                                          return_carry=True)
        lr2 = sgm_mod._scan_diagonal(v_lnd[8:], img[8:], dmask[8:],
                                     0.01, 0.02, dx=dx, carry_in=fin)
        want = np.moveaxis(np.concatenate([np.asarray(lr1), np.asarray(lr2)],
                                          axis=0), -1, 0)
        cp0 = jnp.full((D, W), 1e30, jnp.float32)
        z = jnp.zeros((W,), jnp.float32)
        top, cp, cb, li, ch = sp.sgm_aggregate_diag_block(
            vol[:, :8], img[:8], cp0, z, z, z, 0.01, 0.02, "left",
            dx=dx, width=W)
        bot, _, _, _, _ = sp.sgm_aggregate_diag_block(
            vol[:, 8:], img[8:], cp, cb, ch, li, 0.01, 0.02, "left",
            dx=dx, width=W)
        got = np.concatenate([np.asarray(top), np.asarray(bot)], axis=1)
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("dx", [1, -1])
    def test_diag_block_padded_acc_matches_unpadded(self, interpret, rng, dx):
        """Padded-lane diag segments with acc chaining (the wavefront's
        shared padded accumulator) match the unpadded run on valid lanes —
        the predecessor-inside-width clamp keeps pad garbage out of lane
        W-1 under dx=-1."""
        from kangaroo_tpu.stereo import sgm_pallas as sp

        D, H, W, PAD = 8, 16, 128, 16
        Wp = W + PAD
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))

        cp0 = jnp.full((D, W), 1e30, jnp.float32)
        z = jnp.zeros((W,), jnp.float32)
        want, _, _, _, _ = sp.sgm_aggregate_diag_block(
            vol, img, cp0, z, z, z, 0.01, 0.02, "left", dx=dx, width=W)

        volp = jnp.pad(vol, ((0, 0), (0, 0), (0, PAD)))
        imgp = jnp.pad(img, ((0, 0), (0, PAD)))
        acc = jnp.asarray(rng.random((D, H, Wp)).astype(np.float32))
        cp0p = jnp.full((D, Wp), 1e30, jnp.float32)
        zp = jnp.zeros((Wp,), jnp.float32)
        got, _, _, _, _ = sp.sgm_aggregate_diag_block(
            volp, imgp, cp0p, zp, zp, zp, 0.01, 0.02, "left", dx=dx,
            width=W, acc=acc)
        np.testing.assert_allclose(
            np.asarray(got)[:, :, :W] - np.asarray(acc)[:, :, :W],
            np.asarray(want), atol=1e-5)


class TestShardedWavefrontInterpret:
    """The full use_kv wavefront composition (Pallas carry segments +
    cond + fori_loop + the two orientation-chained aliased accumulators)
    on a 1-device CPU mesh with kernels in interpret mode — the CI twin of
    scripts/check_sharded_tpu.py's hardware run. (The Mosaic interpret
    machinery's thread barrier deadlocks under a multi-device shard_map,
    so the cross-shard ppermute traffic is exercised by the XLA-twin tests
    in test_parallel.py and by the hardware script; this covers the
    on-TPU dispatch path's composition.)"""

    @pytest.mark.parametrize("do_diagonal", [False, True])
    # H=20: a non-multiple-of-8 shard height (the VGA/8-shard Hs=60 class)
    # runs the whole segment as one Pallas block instead of falling back
    @pytest.mark.parametrize("H", [16, 20])
    def test_use_kv_wavefront_matches_xla(self, interpret, rng, monkeypatch,
                                          do_diagonal, H):
        import jax

        from kangaroo_tpu import backend
        from kangaroo_tpu.parallel import mesh as mesh_mod
        from kangaroo_tpu.parallel import sharding
        from kangaroo_tpu.stereo import sgm as sx

        # a jit executable cached from an un-patched call would bypass the
        # forced dispatch (CLAUDE.md pitfall)
        jax.clear_caches()
        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        D, W = 8, 16
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        mesh = mesh_mod.make_mesh(1)
        got = np.asarray(sharding.sharded_semi_global_matching(
            vol, img, 0.01, 0.02, mesh, do_diagonal=do_diagonal))
        want = np.asarray(sx.semi_global_matching(
            vol, img, 0.01, 0.02, do_diagonal=do_diagonal))
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        m = np.broadcast_to(d <= x, (D, H, W))
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5)


class TestAwkwardWidthFallback:
    """Widths the Pallas SGM kernels cannot scan (> 128 and not a multiple
    of ROWS_PER_STEP) must dispatch to the XLA twins, not hit the kernels'
    trace-time length asserts."""

    def test_batched_pipeline_falls_back(self, interpret, rng, monkeypatch):
        from kangaroo_tpu import backend
        from kangaroo_tpu.apps import stereo_sgm, synthetic

        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        jax.clear_caches()
        B, W, H, D = 2, 132, 16, 16
        ls, rs = [], []
        for k in range(B):
            l, r, _ = synthetic.stereo_pair(W, H, D, seed=k)
            ls.append(l)
            rs.append(r)
        cfg = stereo_sgm.SgmConfig(max_disp=D, census_window="9x7")
        got = np.asarray(stereo_sgm.sgm_pipeline_batched(
            jnp.stack(ls), jnp.stack(rs), cfg))
        assert got.shape == (B, H, W)
        assert np.isfinite(got).any()

    def test_reshard_sgm_falls_back(self, interpret, rng, monkeypatch):
        from kangaroo_tpu import backend
        from kangaroo_tpu.parallel import mesh as mesh_mod
        from kangaroo_tpu.parallel import sharding
        from kangaroo_tpu.stereo import sgm as sx

        monkeypatch.setattr(backend, "on_tpu", lambda: True)
        jax.clear_caches()
        D, H, W = 8, 16, 132
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        mesh = mesh_mod.make_mesh(1)
        got = np.asarray(sharding.sharded_semi_global_matching_reshard(
            vol, img, 0.01, 0.02, mesh))
        want = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02))
        d = np.arange(D)[:, None, None]
        x = np.arange(W)[None, None, :]
        m = np.broadcast_to(d <= x, (D, H, W))
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5)


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
        # float intensities are on the app's [0,1] scale (uchar/255,
        # apps.stereo.preprocess_intensity) — dtam_solve computes its edge
        # weight from them directly
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        lam, th0, sq, sdt, al, be = 20.0, 100.0, 0.7, 0.7, 0.002, 1e-5
        want = np.asarray(stereo_app.dtam_solve(
            vol, img, lam, th0, sq, sdt, al, be, 1.0, 2.5, iterations=6))
        g = cv.exponential_edge_weight(img, 1.0, 2.5)
        d0 = fast.cost_vol_minimum_subpix(vol, -1)
        got = np.asarray(dtam_pallas.dtam_solve(
            vol, g, d0, lam, th0, sq, sdt, al, be, iterations=6))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_incremental_step_matches_xla_loop(self, interpret, rng):
        """dtam_step (full state in/out, the reference's global-counter
        annealing) matches apps.stereo.dtam_increment's XLA twin, and two
        chained 3-iteration steps equal one 6-iteration step."""
        from kangaroo_tpu.apps import stereo as stereo_app
        from kangaroo_tpu.stereo import costvolume as cv
        from kangaroo_tpu.stereo import dispatch as fast
        from kangaroo_tpu.stereo import dtam_pallas

        D, H, W = 8, 16, 128
        vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
        img = jnp.asarray(rng.random((H, W)).astype(np.float32))
        g = cv.exponential_edge_weight(img, 1.0, 2.5)
        d0 = fast.cost_vol_minimum_subpix(vol, -1)
        q0 = jnp.zeros((H, W, 2), jnp.float32)
        args = (20.0, 0.7, 0.7, 0.002, 1e-3)  # lam, sq, sd, alpha, beta

        import kangaroo_tpu.backend as backend
        import os

        os.environ["KANGAROO_FORCE_XLA"] = "1"
        try:
            want = stereo_app.dtam_increment(
                vol, g, d0, d0, q0, jnp.float32(100.0), jnp.float32(0.0),
                *args, iterations=6)
        finally:
            del os.environ["KANGAROO_FORCE_XLA"]
        got = dtam_pallas.dtam_step(
            vol, g, d0, d0, q0, jnp.float32(100.0), jnp.float32(0.0),
            *args, iterations=6)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        # chaining: 3 + 3 == 6 (state round-trips exactly)
        s1 = dtam_pallas.dtam_step(
            vol, g, d0, d0, q0, jnp.float32(100.0), jnp.float32(0.0),
            *args, iterations=3)
        s2 = dtam_pallas.dtam_step(vol, g, s1[0], s1[1], s1[2], s1[3], s1[4],
                                   *args, iterations=3)
        for a, b in zip(s2, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


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
