"""Native frame loader and profiling utilities."""
import numpy as np
import pytest

from kangaroo_tpu.io import frame_loader, pxm


@pytest.fixture
def sequence(tmp_path, rng):
    paths = []
    truth = []
    for i in range(6):
        img = (rng.random((12, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / f"frame_{i:03d}.pgm")
        pxm.save_pxm(p, img)
        paths.append(p)
        truth.append(img)
    return paths, truth


class TestFrameLoader:
    def test_native_ordered(self, sequence):
        paths, truth = sequence
        try:
            loader = frame_loader.FrameLoader(paths, n_threads=1, use_native=True)
        except RuntimeError:
            pytest.skip("no g++")
        got = list(loader)
        assert [i for i, _ in got] == list(range(6))
        for i, img in got:
            np.testing.assert_array_equal(img, truth[i])

    def test_native_multithreaded_complete(self, sequence):
        paths, truth = sequence
        try:
            loader = frame_loader.FrameLoader(paths, n_threads=3, use_native=True)
        except RuntimeError:
            pytest.skip("no g++")
        got = dict(loader)
        assert sorted(got.keys()) == list(range(6))
        for i, img in got.items():
            np.testing.assert_array_equal(img, truth[i])

    def test_fallback(self, sequence):
        paths, truth = sequence
        loader = frame_loader.FrameLoader(paths, use_native=False)
        got = list(loader)
        assert len(got) == 6
        np.testing.assert_array_equal(got[2][1], truth[2])

    def test_rgb_frames(self, tmp_path, rng):
        img = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "f.ppm")
        pxm.save_pxm(p, img)
        try:
            loader = frame_loader.FrameLoader([p], use_native=True)
        except RuntimeError:
            pytest.skip("no g++")
        (_, back), = list(loader)
        np.testing.assert_array_equal(back, img)


def test_memory_report():
    from kangaroo_tpu.utils import profiling

    out = profiling.device_memory_report()
    assert isinstance(out, str) and out
