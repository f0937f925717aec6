"""Filtering stack vs golden NumPy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

import reference_impl as ref
from kangaroo_tpu.ops import (
    bilateral as bf,
    blur as blur_mod,
    convolution,
    features,
    integral_image as ii,
    viz,
    warp as warp_mod,
)


class TestBlur:
    def test_binomial_interior(self, rng):
        img = rng.random((8, 8)).astype(np.float32)
        out = np.asarray(blur_mod.blur(jnp.asarray(img)))
        # interior: separable [1 2 1]/4
        x, y = 4, 4
        kx = np.array([1, 2, 1]) / 4.0
        tmp = np.convolve(img[y], kx, mode="same")
        tmp_m1 = np.convolve(img[y - 1], kx, mode="same")
        tmp_p1 = np.convolve(img[y + 1], kx, mode="same")
        want = (tmp_m1[x] + 2 * tmp[x] + tmp_p1[x]) / 4.0
        assert out[y, x] == pytest.approx(want, rel=1e-5)

    def test_binomial_border_norm(self):
        img = np.ones((6, 6), np.float32)
        out = np.asarray(blur_mod.blur(jnp.asarray(img)))
        np.testing.assert_allclose(out, 1.0, rtol=1e-6)

    def test_gaussian_preserves_constant(self):
        img = jnp.full((16, 16), 7.0)
        out = np.asarray(blur_mod.gaussian_blur(img, 2.0, rad=5))
        np.testing.assert_allclose(out, 7.0, rtol=1e-5)

    def test_gaussian_smooths(self, rng):
        img = rng.random((32, 32)).astype(np.float32)
        out = np.asarray(blur_mod.gaussian_blur(jnp.asarray(img), 3.0, rad=10))
        assert out.std() < img.std() * 0.5


class TestBilateral:
    def test_matches_golden(self, rng):
        img = rng.random((10, 12)).astype(np.float32)
        got = np.asarray(bf.bilateral(jnp.asarray(img), 2.0, 0.5, 3))
        want = ref.bilateral(img, 2.0, 0.5, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_above_min_matches_golden(self, rng):
        img = rng.random((10, 12)).astype(np.float32)
        img[img < 0.3] = 0.05  # "too close" depth pixels
        got = np.asarray(bf.bilateral_above_min(jnp.asarray(img), 2.0, 0.2, 3, 0.2))
        want = ref.bilateral(img, 2.0, 0.2, 3, minval=0.2)
        # below-minval centres come out NaN (0/0), like the reference
        m = img >= 0.2
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4)
        assert np.isnan(got[~m]).all()

    def test_cross_guide_identity(self, rng):
        img = rng.random((10, 12)).astype(np.float32)
        got = np.asarray(bf.bilateral_cross(jnp.asarray(img), jnp.asarray(img), 2.0, 0.5, 3))
        want = ref.bilateral(img, 2.0, 0.5, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_cross3_matches_golden(self, rng):
        # the reference's full 3-weight overload: spatial + self range +
        # guide range (cu_bilateral.cu:110-142)
        img = rng.random((10, 12)).astype(np.float32)
        guide = rng.random((10, 12)).astype(np.float32)
        got = np.asarray(
            bf.bilateral_cross(jnp.asarray(img), jnp.asarray(guide),
                               2.0, 0.5, 3, gc=0.3))
        want = ref.bilateral_cross3(img, guide, 2.0, 0.5, 0.3, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_volume_filters_slices_independently(self, rng):
        vol = rng.random((3, 10, 12)).astype(np.float32)
        guide = rng.random((10, 12)).astype(np.float32)
        got = np.asarray(
            bf.bilateral_volume(jnp.asarray(vol), jnp.asarray(guide),
                                2.0, 0.5, 2, gc=0.3))
        for d in range(3):
            want = ref.bilateral_cross3(vol[d], guide, 2.0, 0.5, 0.3, 2)
            np.testing.assert_allclose(got[d], want, rtol=1e-4)


class TestConvolution:
    def test_normalized_box(self, rng):
        img = rng.random((10, 12)).astype(np.float32)
        kern = np.ones((3, 3), np.float32)
        got = np.asarray(convolution.convolve(jnp.asarray(img), jnp.asarray(kern)))
        want = ref.box_filter(img, 1) / 9.0
        np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1], rtol=1e-5)


class TestIntegralImage:
    def test_box_filter_matches_golden(self, rng):
        img = rng.random((12, 16)).astype(np.float32)
        got = np.asarray(ii.box_filter(jnp.asarray(img), 2))
        sums = ref.box_filter(img, 2)
        areas = np.zeros_like(sums)
        H, W = img.shape
        for y in range(H):
            for x in range(W):
                areas[y, x] = (min(y + 2, H - 1) - max(y - 2, 0) + 1) * (
                    min(x + 2, W - 1) - max(x - 2, 0) + 1
                )
        np.testing.assert_allclose(got, sums / areas, rtol=1e-5)

    def test_prefix_sum(self, rng):
        img = rng.random((4, 6)).astype(np.float32)
        got = np.asarray(ii.prefix_sum_rows(jnp.asarray(img)))
        np.testing.assert_allclose(got, np.cumsum(img, axis=1), rtol=1e-6)

    def test_guided_filter_edge_preserving(self, rng):
        # step edge + noise: guided filter should keep the step sharper than
        # a box filter of the same radius
        H, W = 24, 32
        I = np.zeros((H, W), np.float32)
        I[:, 16:] = 1.0
        P = I + rng.normal(0, 0.1, (H, W)).astype(np.float32)
        q = np.asarray(ii.guided_filter(jnp.asarray(P), jnp.asarray(I), 4, 1e-4))
        box = np.asarray(ii.box_filter(jnp.asarray(P), 4))
        edge_q = abs(q[:, 16] - q[:, 15]).mean()
        edge_b = abs(box[:, 16] - box[:, 15]).mean()
        assert edge_q > 3 * edge_b

    def test_guided_filter_volume_shape(self, rng):
        vol = jnp.asarray(rng.random((4, 8, 8)).astype(np.float32))
        I = jnp.asarray(rng.random((8, 8)).astype(np.float32))
        out = ii.guided_filter_volume(vol, I, 2, 1e-3)
        assert out.shape == (4, 8, 8)


class TestFeatures:
    def test_harris_corner_detected(self):
        img = np.zeros((20, 20), np.float32)
        img[8:, 8:] = 255.0  # corner at (8, 8)
        score = np.asarray(features.harris_score(jnp.asarray(img)))
        ys, xs = np.unravel_index(np.argmax(score), score.shape)
        assert abs(ys - 8) <= 2 and abs(xs - 8) <= 2

    def test_nms_unique_max(self, rng):
        score = rng.random((16, 16)).astype(np.float32)
        score[7, 9] = 10.0
        out = np.asarray(features.non_maximal_suppression(jnp.asarray(score), 2, 0.5))
        assert out[7, 9] == 255
        # neighbours suppressed
        assert out[6:9, 8:11].sum() == 255

    def test_segment_test_flat_image_no_corners(self):
        img = jnp.full((16, 16), 100, jnp.uint8)
        out = np.asarray(features.segment_test(img, 20, 9))
        assert out.sum() == 0

    def test_segment_test_dark_dot(self):
        # A dark centre on a light ring triggers the 'light' path. (A bright
        # centre cannot reach min_segment_len=9: the reference's oppdark
        # formula caps the dark path's popcount at 8 — quirk reproduced.)
        img = np.full((16, 16), 250, np.uint8)
        img[8, 8] = 50
        out = np.asarray(features.segment_test(jnp.asarray(img), 20, 9))
        assert out[8, 8] == 255
        bright = np.full((16, 16), 50, np.uint8)
        bright[8, 8] = 250
        out2 = np.asarray(features.segment_test(jnp.asarray(bright), 20, 9))
        assert out2[8, 8] == 0  # reference quirk: dark path popcount <= 8

    def test_get_indices(self):
        s = np.zeros((4, 4), np.float32)
        s[1, 2] = 5.0
        idx = features.get_indices(s, 1.0)
        np.testing.assert_array_equal(idx, [[1, 2]])


class TestWarpViz:
    def test_identity_lookup(self, rng):
        img = rng.random((8, 10)).astype(np.float32)
        lut = warp_mod.create_matlab_lookup_table(10, 8, 100.0, 100.0, 5.0, 4.0, 0.0, 0.0)
        out = np.asarray(warp_mod.warp(jnp.asarray(img), lut))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_distortion_lookup_displaces_corners(self):
        lut = np.asarray(
            warp_mod.create_matlab_lookup_table(10, 8, 10.0, 10.0, 5.0, 4.0, 0.1, 0.0)
        )
        # center maps to itself
        np.testing.assert_allclose(lut[4, 5], [5.0, 4.0], atol=1e-5)
        assert abs(lut[0, 0, 0] - 0.0) > 0.1  # corners displaced

    def test_anaglyph(self, rng):
        l = (rng.random((6, 8)) * 255).astype(np.uint8)
        r = (rng.random((6, 8)) * 255).astype(np.uint8)
        out = np.asarray(viz.make_anaglyph(jnp.asarray(l), jnp.asarray(r)))
        assert out.shape == (6, 8, 4)
        np.testing.assert_array_equal(out[..., 0], l)
        np.testing.assert_array_equal(out[..., 1], r)

    def test_paint_circle(self):
        img = jnp.zeros((10, 10))
        out = np.asarray(viz.paint_circle(img, 1.0, 5.0, 5.0, 2.0))
        assert out[5, 5] == 1.0 and out[5, 7] == 1.0 and out[5, 8] == 0.0

    def test_remap_heat_shape(self, rng):
        img = jnp.asarray(rng.random((6, 8)).astype(np.float32))
        score = jnp.asarray(rng.random((6, 8)).astype(np.float32))
        out = viz.remap_heat(img, score, 0.0, 1.0)
        assert out.shape == (6, 8, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
