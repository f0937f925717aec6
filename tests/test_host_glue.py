"""Host-glue subsystems: rig files, streaming tracker, background pose-graph
solve, debug mode."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kangaroo_tpu.core import se3
from kangaroo_tpu.geometry.pose_graph import PoseGraph
from kangaroo_tpu.io import rig as rig_mod
from kangaroo_tpu.io import tracker as trk
from kangaroo_tpu.utils import debug as dbg


class TestRig:
    def _rig_json(self, tmp_path):
        p = tmp_path / "rig.json"
        p.write_text(
            """
            {"cameras": [
              {"name": "left", "width": 640, "height": 480,
               "fu": 570.342, "fv": 570.342, "u0": 319.5, "v0": 239.5},
              {"name": "right", "width": 640, "height": 480,
               "fu": 570.342, "fv": 570.342, "u0": 319.5, "v0": 239.5,
               "T_wc": [0.12, 0.0, 0.0, 0.0, 0.0, 0.0]}
            ]}
            """
        )
        return str(p)

    def test_load_levels_and_baseline(self, tmp_path):
        rig = rig_mod.load_rig(self._rig_json(tmp_path))
        assert rig.names() == ["left", "right"]
        K0 = rig["left"].K(0)
        K1 = rig["left"].K(1)
        # ScaleK pixel-centre convention (CameraModelPyramid.h:74-82)
        assert K1[0, 0] == pytest.approx(K0[0, 0] / 2)
        assert K1[0, 2] == pytest.approx(0.5 * (K0[0, 2] + 0.5) - 0.5)
        # stereo T_rl / baseline from poses (BaselineFromCamModel.h:5-23)
        T_rl = rig.t_rl("left", "right")
        np.testing.assert_allclose(T_rl[:, :3], np.eye(3), atol=1e-7)
        assert rig.baseline() == pytest.approx(0.12)
        # intrinsics bridge
        K = rig["left"].intrinsics(0)
        assert float(K.fu) == pytest.approx(570.342)
        # pyramid stops when dimensions vanish
        assert len(rig["left"].pyramid(max_levels=20)) <= 11

    def test_roundtrip_and_scale_crop(self, tmp_path):
        rig = rig_mod.load_rig(self._rig_json(tmp_path))
        rig_mod.save_rig(str(tmp_path / "out.json"), rig)
        rig2 = rig_mod.load_rig(str(tmp_path / "out.json"))
        assert rig2["right"].T_wc[0, 3] == pytest.approx(0.12)
        cam = rig["left"].scaled_to(320, 240)
        assert cam.fu == pytest.approx(570.342 / 2)
        cam = rig["left"].cropped_to(10, 20, 600, 440)
        assert cam.u0 == pytest.approx(319.5 - 10)
        assert rig_mod.level_from_max_pixels(640, 480, 640 * 480) == 0
        assert rig_mod.level_from_max_pixels(1280, 960, 640 * 480) == 1


class TestTracker:
    def test_file_playback_history_and_workspace(self, tmp_path):
        lines = []
        for i in range(5):
            x = 0.1 * i
            lines.append(f"{i}.0, {i}.0, {x}, 0.0, 0.5, 0.0, 0.0, 0.0")
        (tmp_path / "vicon.txt").write_text("\n".join(lines))
        t = trk.FileTracking(base_dir=str(tmp_path), autostart=False)
        assert len(t.samples) == 5
        got = []
        t.register_tracking_callback(lambda T, ts, td: got.append((T, ts)))
        t.record_history = True
        t.start(t._pending)
        t.join()
        assert len(got) == 5 and len(t.history) == 5
        assert t.is_connected() is False  # stream ended
        T = t.T_wf()
        assert T[0, 3] == pytest.approx(0.4)
        assert t.workspace_size()[0] == pytest.approx(0.4)
        assert t.is_new_data() is False  # reading T_wf clears the flag

    def test_offset_and_live_stream(self):
        t = trk.StreamTracking()
        t.set_offset(se3.make(np.eye(3), [0.0, 0.0, 1.0]))

        def gen():
            yield trk.cart2t([1.0, 0, 0, 0, 0, 0])

        t.start(gen())
        t.join()
        T = t.T_wf()
        np.testing.assert_allclose(T[:, 3], [1.0, 0.0, 1.0], atol=1e-7)

    def test_cart2t_matches_pose_file_convention(self):
        from kangaroo_tpu.geometry.pose_graph import load_poses_from_file
        import tempfile, os

        vec = [0.3, -0.2, 1.0, 0.1, -0.2, 0.3]
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write(" ".join(str(v) for v in vec))
            path = f.name
        try:
            want = load_poses_from_file(path)[0]
        finally:
            os.unlink(path)
        np.testing.assert_allclose(trk.cart2t(vec), want, atol=1e-6)


class TestPoseGraphBackground:
    def test_background_solve_converges(self):
        g = PoseGraph()
        rng = np.random.default_rng(0)
        T_true = [np.asarray(se3.identity())]
        g.add_keyframe(T_true[0])
        for i in range(1, 5):
            T = np.asarray(se3.make(np.eye(3), [0.2 * i, 0.0, 0.0]), np.float32)
            T_true.append(T)
            # noisy initial estimate
            g.add_keyframe(T + rng.normal(0, 0.05, (3, 4)).astype(np.float32) *
                           np.array([[0, 0, 0, 1.0]] * 3, np.float32))
        for i in range(4):
            T_ji = np.asarray(
                se3.compose(se3.inverse(jnp.asarray(T_true[i + 1])),
                            jnp.asarray(T_true[i])), np.float32)
            g.add_relative_edge(i, i + 1, T_ji)
        g.start(iterations=15)
        assert g.running or True  # may already have finished
        g.join()
        assert not g.running
        for i in range(5):
            np.testing.assert_allclose(g.poses[i][:, 3], T_true[i][:, 3],
                                       atol=1e-3)

    def test_stop_interrupts(self):
        g = PoseGraph()
        for i in range(3):
            g.add_keyframe()
        g.add_relative_edge(0, 1, np.asarray(se3.identity()))
        g.start(iterations=10000)
        g.stop()
        assert not g.running


class TestDebugMode:
    def test_debug_nans_catches_poison(self):
        @jax.jit
        def bad(x):
            return jnp.log(x - 2.0)  # NaN for x < 2

        with pytest.raises(FloatingPointError):
            with dbg.debug_mode():
                np.asarray(bad(jnp.asarray(1.0)))
        # mode restored afterwards: the same call passes
        assert not jax.config.jax_debug_nans
        assert np.isnan(np.asarray(bad(jnp.asarray(1.0))))

    def test_checked_reports_location(self):
        def f(x):
            dbg.assert_all_finite(x, "depth")
            return x * 2

        cf = dbg.checked(f)
        err, out = cf(jnp.asarray([1.0, jnp.nan]))
        with pytest.raises(Exception, match="depth contains non-finite"):
            err.throw()
        err, out = cf(jnp.asarray([1.0, 2.0]))
        err.throw()  # no error
        np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])
