"""Containers and core math: Intrinsics, BoundingBox, volumes, SE3, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import sampling, se3


class TestIntrinsics:
    def test_project_unproject_roundtrip(self):
        K = kt.Intrinsics.create(500.0, 505.0, 320.0, 240.0)
        P = jnp.array([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0]])
        p = K.project(P)
        back = K.unproject(p[:, 0], p[:, 1], P[:, 2])
        np.testing.assert_allclose(np.asarray(back), np.asarray(P), rtol=1e-6)

    def test_project_values(self):
        # u = u0 + fu*x/z (ImageIntrinsics.h:87-91)
        K = kt.Intrinsics.create(100.0, 200.0, 10.0, 20.0)
        p = K.project(jnp.array([1.0, 1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(p), [10.0 + 50.0, 20.0 + 100.0])

    def test_pyramid_level(self):
        # K[l]: scale*fu, scale*(u0+0.5)-0.5 (ImageIntrinsics.h:137-142)
        K = kt.Intrinsics.create(500.0, 500.0, 319.5, 239.5)
        K1 = K.level(1)
        assert float(K1.fu) == 250.0
        assert float(K1.u0) == pytest.approx(0.5 * (319.5 + 0.5) - 0.5)

    def test_centered(self):
        K = kt.Intrinsics.centered(500.0, 640, 480)
        assert float(K.u0) == 319.5
        assert float(K.v0) == 239.5

    def test_level_from_max_pixels(self):
        assert kt.level_from_max_pixels(1280, 960, 640 * 480) == 1
        assert kt.level_from_max_pixels(640, 480, 640 * 480) == 0

    def test_matrix(self):
        K = kt.Intrinsics.create(500.0, 505.0, 320.0, 240.0)
        M = np.asarray(K.matrix())
        Minv = np.asarray(K.inverse_matrix())
        np.testing.assert_allclose(M @ Minv, np.eye(3), atol=1e-4)


class TestBoundingBox:
    def test_size_center(self):
        bb = kt.BoundingBox.create((-1, -2, -3), (1, 2, 3))
        np.testing.assert_allclose(np.asarray(bb.size()), [2, 4, 6])
        np.testing.assert_allclose(np.asarray(bb.center()), [0, 0, 0])

    def test_insert_intersect(self):
        bb = kt.BoundingBox.empty().insert([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(bb.lo), [0, 0, 0])
        np.testing.assert_allclose(np.asarray(bb.hi), [1, 2, 3])
        o = kt.BoundingBox.create((0.5, 0.5, 0.5), (5, 5, 5))
        i = bb.intersect(o)
        np.testing.assert_allclose(np.asarray(i.lo), [0.5, 0.5, 0.5])
        np.testing.assert_allclose(np.asarray(i.hi), [1, 2, 3])

    def test_fit_to_frustum_contains_frustum(self):
        K = kt.Intrinsics.centered(100.0, 64, 48)
        T_wc = se3.identity()
        bb = kt.fit_to_frustum(K, 64, 48, T_wc, 0.5, 4.0)
        # camera center and a far-corner point must be inside
        assert bool(bb.contains(jnp.zeros(3)))
        corner = K.unproject(63.0, 47.0) * 4.0
        assert bool(bb.contains(corner))


class TestSE3:
    def test_exp_identity(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.asarray(se3.identity()), atol=1e-7)

    def test_exp_pure_translation(self):
        T = se3.exp(jnp.array([1.0, 2.0, 3.0, 0, 0, 0]))
        np.testing.assert_allclose(np.asarray(se3.translation(T)), [1, 2, 3], atol=1e-6)

    def test_exp_rotation_90deg(self):
        T = se3.exp(jnp.array([0, 0, 0, 0, 0, np.pi / 2]))
        p = se3.transform(T, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)

    def test_inverse_compose(self):
        T = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, -0.1, 0.15]))
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.asarray(se3.identity()), atol=1e-6)

    def test_transform_inv_matches_inverse(self):
        T = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, -0.1, 0.15]))
        p = jnp.array([[0.5, -1.0, 2.0]])
        a = se3.transform_inv(T, p)
        b = se3.transform(se3.inverse(T), p)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_generator_products(self):
        # finite-difference check: d/de exp(e*g_i)*p = gen_i(p)
        p = jnp.array([0.5, -1.0, 2.0])
        G = np.asarray(se3.generator_products(p))
        eps = 1e-4
        for i in range(6):
            xi = np.zeros(6)
            xi[i] = eps
            dp = (np.asarray(se3.transform(se3.exp(jnp.asarray(xi)), p)) - np.asarray(p)) / eps
            np.testing.assert_allclose(G[i], dp, atol=3e-3)

    def test_plane_b_from_a_identity(self):
        n = jnp.array([0.0, 0.0, -0.5])
        out = se3.plane_b_from_a(se3.identity(), n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-7)


class TestSampling:
    def test_bilinear_matches_manual(self, rng):
        img = jnp.asarray(rng.random((8, 10), dtype=np.float32))
        v = sampling.bilinear(img, 2.25, 3.5)
        a = np.asarray(img)
        manual = (
            a[3, 2] * 0.75 * 0.5 + a[3, 3] * 0.25 * 0.5 + a[4, 2] * 0.75 * 0.5 + a[4, 3] * 0.25 * 0.5
        )
        assert float(v) == pytest.approx(manual, rel=1e-6)

    def test_bilinear_integer_coords(self, rng):
        img = jnp.asarray(rng.random((8, 10), dtype=np.float32))
        v = sampling.bilinear(img, 4.0, 5.0)
        assert float(v) == pytest.approx(float(img[5, 4]))

    def test_bilinear_multichannel(self, rng):
        img = jnp.asarray(rng.random((8, 10, 3), dtype=np.float32))
        v = sampling.bilinear(img, jnp.array([2.5]), jnp.array([3.5]))
        assert v.shape == (1, 3)

    def test_central_diff(self):
        img = jnp.arange(30, dtype=jnp.float32).reshape(5, 6)
        dx, dy = sampling.central_diff(img, 2, 2)
        assert float(dx) == pytest.approx(1.0)
        assert float(dy) == pytest.approx(6.0)

    def test_catmull_rom_interpolates_at_integers(self, rng):
        img = jnp.asarray(rng.random((8, 10), dtype=np.float32))
        v = sampling.catmull_rom(img, 4.0, 5.0)
        assert float(v) == pytest.approx(float(img[5, 4]), abs=1e-6)

    def test_in_bounds(self):
        img = jnp.zeros((10, 20))
        assert bool(sampling.in_bounds(img, 0.0, 0.0))
        assert not bool(sampling.in_bounds(img, 20.5, 5.0))
        assert bool(sampling.in_bounds(img, 19.5, 5.0))
        assert not bool(sampling.in_bounds(img, 1.0, 1.0, border=2))

    def test_take_f32_bits_bit_exact(self, rng):
        # signaling NaNs / denormals reinterpreted from random bit patterns
        # must survive the 16-bit-halves round trip exactly (sampling.py)
        bits = rng.integers(0, 2**32, size=(64, 3), dtype=np.uint32)
        flat = jnp.asarray(bits).view(jnp.float32)
        idx = jnp.asarray(rng.integers(0, 64, size=(5, 7)), jnp.int32)
        got = sampling.take_f32_bits(flat, idx)
        want = jnp.take(flat, idx, axis=0)
        assert got.shape == want.shape == (5, 7, 3)
        np.testing.assert_array_equal(
            np.asarray(got).view(np.uint32), np.asarray(want).view(np.uint32))
        # 1-D operand
        got1 = sampling.take_f32_bits(flat[:, 0], idx.reshape(-1))
        np.testing.assert_array_equal(
            np.asarray(got1).view(np.uint32),
            np.asarray(jnp.take(flat[:, 0], idx.reshape(-1))).view(np.uint32))

    def test_take_f32_bits_grad_is_scatter_add(self, rng):
        flat = jnp.asarray(rng.random((16,), dtype=np.float32))
        idx = jnp.array([3, 3, 7], jnp.int32)
        g = jax.grad(lambda f: sampling.take_f32_bits(f, idx).sum())(flat)
        want = np.zeros(16, np.float32)
        want[3], want[7] = 2.0, 1.0
        np.testing.assert_allclose(np.asarray(g), want)

    def test_take_f32_bits_flag_routes(self, rng):
        # the route is an explicit STATIC argument, not ambient state —
        # jit's tracing cache is keyed on avals only, so a context-manager
        # flag silently reuses whichever trace came first (sampling.py)
        flat = jnp.asarray(rng.random((32, 2), dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, 32, size=(9,)), jnp.int32)
        default = jax.make_jaxpr(sampling.take_f32)(flat, idx)
        assert "bitcast_convert_type" in str(default)
        plain = jax.make_jaxpr(
            lambda f, i: sampling.take_f32(f, i, bits=False))(flat, idx)
        assert "bitcast_convert_type" not in str(plain)
        np.testing.assert_array_equal(
            np.asarray(sampling.take_f32(flat, idx, bits=False)),
            np.asarray(jnp.take(flat, idx, axis=0)))


class TestVolume:
    def test_voxel_positions_corners(self):
        vol = kt.BoundedVolume.create(4, 4, 4, kt.BoundingBox.create((-1, -1, -1), (1, 1, 1)))
        pos = np.asarray(vol.voxel_positions())
        np.testing.assert_allclose(pos[0, 0, 0], [-1, -1, -1])
        np.testing.assert_allclose(pos[3, 3, 3], [1, 1, 1])

    def test_trilinear_linear_field(self):
        # a linear field is reproduced exactly by trilinear interpolation
        bb = kt.BoundingBox.create((0, 0, 0), (1, 1, 1))
        vol = kt.BoundedVolume.create(9, 9, 9, bb)
        pos = vol.voxel_positions()
        field = 2.0 * pos[..., 0] - 3.0 * pos[..., 1] + 0.5 * pos[..., 2]
        vol = vol.replace(data=field)
        q = jnp.array([[0.31, 0.47, 0.83], [0.5, 0.5, 0.5]])
        want = 2.0 * q[:, 0] - 3.0 * q[:, 1] + 0.5 * q[:, 2]
        got = vol.sample_trilinear_world(q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grad_linear_field(self):
        bb = kt.BoundingBox.create((0, 0, 0), (1, 1, 1))
        vol = kt.BoundedVolume.create(9, 9, 9, bb)
        pos = vol.voxel_positions()
        field = 2.0 * pos[..., 0] - 3.0 * pos[..., 1] + 0.5 * pos[..., 2]
        vol = vol.replace(data=field)
        g = vol.grad_backward_world(jnp.array([0.5, 0.5, 0.5]))
        np.testing.assert_allclose(np.asarray(g), [2.0, -3.0, 0.5], atol=1e-4)

    def test_tsdf_reset_state(self):
        tsdf = kt.TsdfVolume.create(8, 8, 8, trunc_dist=0.25)
        assert float(tsdf.val[0, 0, 0]) == 0.25
        assert float(tsdf.weight.sum()) == 0.0


class TestPyramidOps:
    def test_box_reduce(self, rng):
        img = jnp.asarray(rng.random((16, 16), dtype=np.float32))
        pyr = kt.pyramid.box_reduce(img, 3)
        assert [p.shape for p in pyr] == [(16, 16), (8, 8), (4, 4)]
        manual = np.asarray(img).reshape(8, 2, 8, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(np.asarray(pyr[1]), manual, rtol=1e-6)

    def test_box_half_ignore_invalid(self):
        img = jnp.array([[1.0, jnp.nan], [3.0, jnp.nan]])
        out = kt.resample.box_half_ignore_invalid(img)
        assert float(out[0, 0]) == pytest.approx(2.0)
        img_all_bad = jnp.full((2, 2), jnp.nan)
        assert bool(jnp.isnan(kt.resample.box_half_ignore_invalid(img_all_bad)[0, 0]))

    def test_resample_bilinear_shape(self, rng):
        img = jnp.asarray(rng.random((32, 48), dtype=np.float32))
        out = kt.resample.resample(img, 24, 16, "bilinear")
        assert out.shape == (16, 24)


class TestElementwise:
    def test_ops(self, rng):
        from kangaroo_tpu.ops import elementwise as ew

        a = jnp.asarray(rng.random((4, 4), dtype=np.float32))
        b = jnp.asarray(rng.random((4, 4), dtype=np.float32))
        np.testing.assert_allclose(np.asarray(ew.add(a, b, 2.0, -1.0, 0.5)), 2 * np.asarray(a) - np.asarray(b) + 0.5, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ew.image_l1(a)), np.abs(np.asarray(a)).sum(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ew.square(a)), np.asarray(a) ** 2, rtol=1e-6)


class TestInvalid:
    def test_sentinels(self):
        from kangaroo_tpu.core import invalid

        assert np.isnan(float(invalid.invalid_value(jnp.float32)))
        assert int(invalid.invalid_value(jnp.uint8)) == 0
        assert int(invalid.invalid_value(jnp.int32)) == -1
        assert not bool(invalid.is_valid(jnp.float32(jnp.nan)))
        assert bool(invalid.is_valid(jnp.float32(1.0)))


class TestPxmIO:
    def test_image_roundtrip(self, tmp_path, rng):
        from kangaroo_tpu.io import pxm

        img = (rng.random((6, 8)) * 255).astype(np.uint8)
        p = str(tmp_path / "img.pgm")
        pxm.save_pxm(p, img)
        back = pxm.load_pxm(p)
        np.testing.assert_array_equal(back, img)

    def test_float_volume_roundtrip(self, tmp_path, rng):
        from kangaroo_tpu.io import pxm

        vol = rng.random((4, 6, 8)).astype(np.float32)
        p = str(tmp_path / "vol.vol")
        pxm.save_volume(p, vol)
        back = pxm.load_volume(p, np.float32)
        np.testing.assert_array_equal(back, vol)

    def test_pdm_roundtrip(self, tmp_path, rng):
        # the stereo app's P7 depth-map export (stereo/main.cpp:404-410)
        from kangaroo_tpu.io import pxm

        depth = rng.random((6, 8)).astype(np.float32)
        p = str(tmp_path / "SDepth-00000.pdm")
        pxm.save_pdm(p, depth)
        with open(p, "rb") as f:
            head = f.read(32)
        assert head.startswith(b"P7\n8 6\n4294967295\n")
        np.testing.assert_array_equal(pxm.load_pdm(p), depth)

    def test_export_depthmap_names_and_content(self, tmp_path, rng):
        from kangaroo_tpu.apps import stereo as stereo_app
        from kangaroo_tpu.io import pxm

        disp = (rng.random((6, 8)) * 16 + 1).astype(np.float32)
        left = (rng.random((6, 8)) * 255).astype(np.uint8)
        dpath, gpath = stereo_app.export_depthmap(
            str(tmp_path), disp, left, fu=40.0, baseline=0.1, frame=3)
        assert dpath.endswith("SDepth-00003.pdm")
        assert gpath.endswith("Left-00003.pgm")
        depth = pxm.load_pdm(dpath)
        np.testing.assert_allclose(depth, 40.0 * 0.1 / disp, rtol=1e-6)
        np.testing.assert_array_equal(pxm.load_pxm(gpath), left)
        # -export_time flag: %015.10f timestamp index (main.cpp:396-398)
        dpath, _ = stereo_app.export_depthmap(
            str(tmp_path), disp, left, fu=40.0, baseline=0.1,
            timestamp=12.5)
        assert dpath.endswith("SDepth-0012.5000000000.pdm")

    def test_tsdf_roundtrip(self, tmp_path):
        from kangaroo_tpu.io import pxm

        tsdf = kt.TsdfVolume.create(8, 8, 8, kt.BoundingBox.create((-2, -2, -2), (2, 2, 2)), trunc_dist=0.1)
        p = str(tmp_path / "save.vol")
        pxm.save_tsdf(p, tsdf)
        back = pxm.load_tsdf(p)
        np.testing.assert_allclose(np.asarray(back.val), np.asarray(tsdf.val))
        np.testing.assert_allclose(np.asarray(back.bbox.lo), [-2, -2, -2])


def test_pytrees_jit():
    """Containers must flow through jit as pytrees."""
    K = kt.Intrinsics.create(500.0, 500.0, 319.5, 239.5)

    @jax.jit
    def f(K, P):
        return K.project(P)

    out = f(K, jnp.array([[0.1, 0.2, 1.0]]))
    assert out.shape == (1, 2)


class TestBoxHalfOddSizes:
    """reduce_window lowering must match the old strided-slice semantics
    (crop to even dims) for odd inputs."""

    def test_odd_dims_cropped(self):
        import numpy as np

        from kangaroo_tpu.ops import resample

        rng = np.random.default_rng(3)
        img = rng.random((7, 9)).astype(np.float32)
        out = np.asarray(resample.box_half(jnp.asarray(img)))
        assert out.shape == (3, 4)
        want = img[:6, :8].reshape(3, 2, 4, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_ignore_invalid_odd_dims(self):
        import numpy as np

        from kangaroo_tpu.ops import resample

        rng = np.random.default_rng(4)
        img = rng.random((5, 7)).astype(np.float32)
        img[1, 2] = np.nan
        img[0, :2] = np.nan
        out = np.asarray(resample.box_half_ignore_invalid(jnp.asarray(img)))
        assert out.shape == (2, 3)
        # block (0,0) has both top entries NaN -> mean of the two valid
        c = img[:4, :6].reshape(2, 2, 3, 2)
        blocks = c.transpose(0, 2, 1, 3).reshape(2, 3, 4)
        want = np.array([[np.nanmean(b) if np.isfinite(b).any() else np.nan
                          for b in row] for row in blocks])
        np.testing.assert_allclose(out, want, rtol=1e-6)
