"""Coverage for secondary paths: CostVolElem stereo volume, bilateral volume
filtering, converts, viz cross-sections, 16-bit PXM, timing utilities."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.ops import bilateral, convert, viz
from kangaroo_tpu.stereo import costvolume as cv


class TestCostVolumeFromStereo:
    def test_self_pair_zero_at_d0(self, rng):
        img = jnp.asarray((rng.random((16, 20)) * 255).astype(np.float32))
        n, s = cv.cost_volume_from_stereo(img, img, 4, -1, rad=2)
        n = np.asarray(n)
        s = np.asarray(s)
        inner = np.s_[4:-4, 6:-4]
        assert (n[0][inner] == 1).all()
        np.testing.assert_allclose(s[0][inner], 0.0, atol=1e-3)
        # d=2 against itself is nonzero for textured content
        assert s[2][inner].mean() > 1.0

    def test_elem_to_float(self):
        n = jnp.array([[0.0, 2.0]])
        s = jnp.array([[5.0, 4.0]])
        out = np.asarray(cv.cost_elem_to_float(n, s))
        assert out[0, 0] == 1e30 and out[0, 1] == 2.0


class TestBilateralVolume:
    def test_matches_per_slice(self, rng):
        vol = jnp.asarray(rng.random((3, 10, 12)).astype(np.float32))
        guide = jnp.asarray(rng.random((10, 12)).astype(np.float32))
        out = bilateral.bilateral_volume(vol, guide, 2.0, 0.5, 2)
        single = bilateral.bilateral_cross(vol[1], guide, 2.0, 0.5, 2)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-5)


class TestConvert:
    def test_gray_rgb_roundtrip(self, rng):
        g = jnp.asarray((rng.random((6, 8)) * 255).astype(np.uint8))
        rgb = convert.gray_to_rgb(g)
        back = convert.rgb_to_gray(rgb)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(g))

    def test_integer_mean_semantics(self):
        # uchar3 -> uchar uses integer sum/3 (pixel_convert.h:29-35)
        px = jnp.asarray(np.array([[[255, 0, 0]]], np.uint8))
        assert int(convert.rgb_to_gray(px)[0, 0]) == 85

    def test_rgba_helpers(self, rng):
        rgb = jnp.asarray((rng.random((4, 4, 3)) * 255).astype(np.uint8))
        rgba = convert.rgb_to_rgba(rgb)
        assert rgba.shape == (4, 4, 4) and int(rgba[0, 0, 3]) == 255
        np.testing.assert_array_equal(np.asarray(convert.rgba_to_rgb(rgba)), np.asarray(rgb))

    def test_float_uint8(self, rng):
        f = jnp.asarray(rng.random((4, 4)).astype(np.float32))
        u = convert.to_uint8(f)
        f2 = convert.to_float(u)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1 / 255.0)


class TestViz:
    def test_cross_section_marks_choice(self, rng):
        vol = jnp.asarray(rng.random((6, 4, 8)).astype(np.float32))
        disp = jnp.asarray((rng.random((4, 8)) * 5).astype(np.float32))
        out = np.asarray(viz.disparity_cross_section(vol, disp, 2))
        assert out.shape == (6, 8, 3)
        d0 = int(np.round(float(disp[2, 3])))
        np.testing.assert_allclose(out[d0, 3], [1, 0, 0], atol=1e-6)


class TestPxm16:
    def test_uint16_roundtrip(self, tmp_path, rng):
        from kangaroo_tpu.io import pxm

        img = (rng.random((6, 8)) * 65535).astype(np.uint16)
        p = str(tmp_path / "d.pgm")
        pxm.save_pxm(p, img)
        back = pxm.load_pxm(p)
        np.testing.assert_array_equal(back, img)


class TestTimer:
    def test_timer_summary(self):
        from kangaroo_tpu.utils.timing import Timer

        t = Timer("x")
        t.start()
        t.stop()
        t.start()
        t.stop()
        assert t.avg >= 0 and t.min <= t.max and len(t.times) == 2
        t.print_summary()


class TestBenchPerfRegen:
    def test_update_perf_headline_rewrites_sentinel_block(self, tmp_path):
        """bench.py's doc regeneration: the sentinel block is replaced with
        this run's numbers and the rest of the file is untouched."""
        import bench

        p = tmp_path / "PERF.md"
        p.write_text(
            "# header\n\nprose before\n\n"
            "<!-- BENCH:BEGIN (auto-written by bench.py) -->\n"
            "| old | table |\n"
            "<!-- BENCH:END -->\n\nprose after\n")
        cfgs = {
            "sgm_stereo_8path_fps": 200.0,
            "fuse_raycast_256_vga_ms": 5.0,
            "kinectfusion_frame_one_jit_ms": 6.0,
            "dtam_stereo_frame_ms": 8.0,
        }
        bench.update_perf_headline(300.0, cfgs, path=str(p))
        text = p.read_text()
        assert "old | table" not in text
        assert "300.0 fps" in text
        assert "**6.00 ms" in text
        assert text.startswith("# header")
        assert text.rstrip().endswith("prose after")
        # idempotent: a second run replaces, not appends
        bench.update_perf_headline(310.0, cfgs, path=str(p))
        text2 = p.read_text()
        assert "300.0 fps" not in text2 and "310.0 fps" in text2


class TestBenchSequenceConfig:
    def test_bench_kf_sequence_runs_small(self):
        """The sequence-replay bench config must execute end to end (it
        feeds BENCH_r{N}.json; a crash there loses the whole artifact).
        Small shapes on CPU; the driver runs the 256^3/VGA default."""
        import bench

        ms = bench.bench_kf_sequence(iters=2, n_frames=2, res=32,
                                     wh=(64, 48))
        assert np.isfinite(ms) and ms >= 0
