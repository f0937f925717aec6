"""The `kangaroo_tpu.roo` reference-namespace shim resolves and runs.

Guards the migration aid: every re-exported reference name must import,
be callable, and the representative calls must behave like the functions
they alias (mis-wired aliases would import fine but compute nonsense).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu import roo


class TestNamespace:
    def test_every_export_is_callable(self):
        assert len(roo.__all__) >= 70
        for name in roo.__all__:
            assert callable(getattr(roo, name)), name

    def test_reference_header_names_present(self):
        # One spot-check per reference header wired into the shim.
        for name in [
            "Blur", "BilateralFilter", "MedianFilter3x3", "Convolution",
            "BoxFilter", "ElementwiseAdd", "Warp", "MakeAnaglyth",
            "PaintCircle", "Remap", "SegmentTest", "Census",
            "CostVolMinimum", "SemiGlobalMatching", "Disp2Depth",
            "NormalsFromVbo", "SdfFuse", "RaycastSdf",
            "PoseRefinementProjectiveIcpPointPlane", "PlaneFitGN",
            "ManhattanLineCost", "UpdateHeightMap",
            "GenerateTriangleStripIndexBuffer", "GradU",
            "TGV_L1_DenoisingIteration", "DeconvolutionDual_qAscent",
            # round-3 completions: resample/reduce.h family, guided-filter
            # statistics, conversion dispatcher, demo/benchmark entries
            "Resample", "BoxHalf", "BoxHalfIgnoreInvalid", "BoxReduce",
            "BoxReduceIgnoreInvalid", "BlurReduce", "ComputeCovariance",
            "GuidedFilter", "ConvertImage", "CostVolumeCrossSection",
            "DenseStereoTest", "DenseStereoSubpix", "SumSpeedTest",
        ]:
            assert hasattr(roo, name), name

    def test_covers_every_reference_header_export(self):
        """Every host-callable function name declared in the reference's
        cu_*.h / reduce.h headers resolves in the shim (the full kangaroo.h
        surface, SURVEY.md §2.3)."""
        import re
        from pathlib import Path

        ref = Path("/root/reference/include/kangaroo")
        if not ref.is_dir():
            import pytest

            pytest.skip("reference tree not available")
        # any return-type token (incl. template params like 'Tout ImageL1')
        # before a capitalised name at a declaration start — not a fixed
        # list of return types, so new/odd declarations can't silently
        # escape the check (ADVICE r3)
        pat = re.compile(
            r"^\s*(?:inline\s+|static\s+|const\s+)?"
            r"(?!template|typedef|return|namespace|struct|class|else|using|"
            r"if|for|while)"
            r"[A-Za-z_]\w*(?:<[^;{}]*?>)?[\s&*]+([A-Z]\w*)\s*\(",
            re.MULTILINE)
        names = set()
        for h in list(ref.glob("cu_*.h")) + [ref / "reduce.h"]:
            names |= set(pat.findall(h.read_text(errors="ignore")))
        # floor against regex rot: the cu_*.h surface declares 100 distinct
        # host entry points today; a collapsing pattern must fail loudly
        assert len(names) >= 95, f"regex extracted only {len(names)} names"
        missing = sorted(n for n in names if not hasattr(roo, n))
        assert not missing, f"reference names missing from shim: {missing}"


class TestRepresentativeCalls:
    def test_filtering(self, rng):
        img = jnp.asarray(rng.random((16, 24), np.float32))
        assert np.allclose(roo.GaussianBlur(img, 2.0, rad=3),
                           kt.ops.blur.gaussian_blur(img, 2.0, rad=3))
        assert roo.MedianFilter3x3(img).shape == img.shape
        assert np.allclose(roo.ImageL1(img), jnp.abs(img).sum())

    def test_stereo_chain(self, rng):
        right = jnp.asarray(rng.random((16, 48)).astype(np.float32))
        left = jnp.roll(right, 3, axis=1)
        vol = roo.CensusStereoVolume(roo.Census(left, window="9x7"),
                                     roo.Census(right, window="9x7"),
                                     max_disp=8)
        disp = roo.CostVolMinimum(vol)
        inner = np.asarray(disp)[:, 8:40]
        assert np.median(inner) == 3

    def test_fusion_roundtrip(self):
        bbox = kt.BoundingBox.create((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        vol = kt.TsdfVolume.create(16, 16, 16, bbox, trunc_dist=0.5)
        vol = roo.SdfSphere(vol, jnp.zeros(3), 0.5)
        centre = np.asarray(vol.val)[8, 8, 8]
        corner = np.asarray(vol.val)[0, 0, 0]
        assert centre < 0 < corner

    def test_variational_adjoint(self, rng):
        # div is the negative adjoint of grad on the solver's dual subspace
        # (far-boundary p entries zero — see test_variational.py).
        u = jnp.asarray(rng.random((12, 12)).astype(np.float32))
        p = rng.random((12, 12, 2)).astype(np.float32)
        p[:, -1, 0] = 0.0
        p[-1, :, 1] = 0.0
        lhs = (roo.GradU(u) * jnp.asarray(p)).sum()
        rhs = -(u * roo.Divergence(jnp.asarray(p))).sum()
        assert np.allclose(lhs, rhs, atol=1e-4)

    def test_resample_and_convert(self, rng):
        img = jnp.asarray(rng.random((16, 24), np.float32))
        assert roo.BoxHalf(img).shape == (8, 12)
        assert roo.Resample(img, 12, 8).shape == (8, 12)
        pyr = roo.BoxReduce(img, 3)
        assert pyr[2].shape == (4, 6)
        rgb = roo.ConvertImage(img, "rgb")
        assert rgb.shape == (16, 24, 3)
        assert np.allclose(roo.ConvertImage(rgb, "gray"), img, atol=1e-6)
        u8 = roo.ConvertImage(img, "uint8")
        assert u8.dtype == jnp.uint8
        assert roo.ConvertImage(u8, "float").dtype == jnp.float32
        # uchar->uchar is the identity (pixel_convert.h), not another scale
        assert np.array_equal(roo.ConvertImage(u8, "uint8"), u8)
        f = jnp.asarray(rng.random((4, 4)).astype(np.float32))
        assert np.allclose(roo.ConvertImage(f, "float"), f)

    def test_cost_volume_cross_section(self, rng):
        # reference semantics (cu_dense_stereo.cu:767-789): normalised
        # (sum/n)/255 slice of a CostVolElem volume, NaN where unvisited
        n = jnp.asarray(np.array([[[2, 0]]], np.int32))          # (1, 1, 2)
        s = jnp.asarray(np.array([[[510.0, 7.0]]], np.float32))
        out = np.asarray(roo.CostVolumeCrossSection((n, s), 0))
        assert out.shape == (1, 2)
        assert out[0, 0] == pytest.approx((510.0 / 2) / 255.0)
        assert np.isnan(out[0, 1])
        vol = jnp.asarray(rng.random((4, 3, 5)).astype(np.float32))
        out = np.asarray(roo.CostVolumeCrossSection(vol, 1))
        assert np.allclose(out, np.asarray(vol)[:, 1, :] / 255.0)

    def test_dense_stereo_wrappers(self, rng):
        right = jnp.asarray(rng.random((20, 40)).astype(np.float32))
        left = jnp.roll(right, 3, axis=1)
        d = roo.DenseStereoTest(left, right, 6, rad=1)
        inner = np.asarray(d)[6:14, 12:32]
        assert np.median(inner[inner >= 0]) == 3
        ds = roo.DenseStereoSubpix(left, right, 6)
        good = np.asarray(ds)[6:14, 12:32]
        # the parabola rescores with interpolated taps, so refinement jitters
        # around the integer optimum rather than landing exactly on it
        assert abs(np.nanmedian(good) - 3.0) < 0.05

    def test_sum_speed_entry(self, rng):
        J = jnp.asarray(rng.random((8, 8, 6), np.float32))
        y = jnp.asarray(rng.random((8, 8), np.float32))
        s = roo.SumSpeedTest(J, y)
        assert s.JTJ.shape == (6, 6) and float(s.obs) == 64.0

    def test_depth_tools(self):
        disp = jnp.full((4, 4), 2.0, jnp.float32)
        depth = roo.Disp2Depth(disp, fu=100.0, baseline=0.1)
        assert np.allclose(depth, 100.0 * 0.1 / 2.0)
