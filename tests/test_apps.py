"""End-to-end application drivers on synthetic data (small sizes for CI)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf
from kangaroo_tpu.apps import stereo as stereo_app
from kangaroo_tpu.apps import stereo_sgm
from kangaroo_tpu.apps import synthetic
from kangaroo_tpu.core import se3


class TestSyntheticData:
    def test_stereo_pair_groundtruth(self):
        left, right, gt = synthetic.stereo_pair(64, 48, 16, seed=1)
        l = np.asarray(left)
        r = np.asarray(right)
        g = np.asarray(gt).astype(int)
        # left[x] must equal right[x - d]
        for y, x in [(24, 40), (10, 30), (30, 50)]:
            assert l[y, x] == r[y, x - g[y, x]]

    def test_depth_sequence_shapes(self):
        K = kt.Intrinsics.centered(40.0, 48, 36)
        frames = list(synthetic.depth_sequence(2, K, 48, 36))
        assert len(frames) == 2
        T, d = frames[0]
        assert T.shape == (3, 4) and d.shape == (36, 48)


class TestSgmApp:
    def test_recovers_synthetic_disparity(self):
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg = stereo_sgm.SgmConfig(max_disp=16, census_window="9x7", p1=0.03, p2=0.1)
        disp = np.asarray(stereo_sgm.sgm_pipeline(left, right, cfg))
        g = np.asarray(gt)
        valid = np.isfinite(disp)
        inner = np.zeros_like(valid)
        inner[8:-8, 20:-8] = True
        m = valid & inner
        assert m.sum() / inner.sum() > 0.5
        err = np.abs(disp[m] - g[m])
        assert np.median(err) < 1.0
        assert (err < 1.0).mean() > 0.8

    def test_cost_volume_filters(self):
        # stereo2's pre-aggregation toggles (main.cpp:391-421): guided
        # filter + 3-weight cross bilateral on every slice. Both on, the
        # pipeline must still recover the synthetic disparity.
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg = stereo_sgm.SgmConfig(
            max_disp=16, census_window="9x7", p1=0.03, p2=0.1,
            guided_filter=True, filter_rad=4,
            bilateral_filter=True, bilateral_size=3)
        disp = np.asarray(stereo_sgm.sgm_pipeline(left, right, cfg))
        g = np.asarray(gt)
        valid = np.isfinite(disp)
        inner = np.zeros_like(valid)
        inner[8:-8, 20:-8] = True
        m = valid & inner
        assert m.sum() / inner.sum() > 0.5
        err = np.abs(disp[m] - g[m])
        assert np.median(err) < 1.0


class TestVariationalStereoApp:
    def test_avg_rad_and_tag_volume(self):
        # ui.avg_rad box-mean subtract (main.cpp:309-312) + the
        # trunc-abs-grad cost path (use_census=False) at the preprocessed
        # [0,1] scale: WTA must still recover the synthetic disparity.
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg = stereo_app.StereoConfig(max_disp=16, census_window="9x7",
                                      avg_rad=8, lr_check=True)
        pre = np.asarray(stereo_app.preprocess_intensity(left, cfg))
        assert abs(pre.mean() - 0.5) < 0.05  # re-centred at 0.5
        disp = np.asarray(stereo_app.stereo_pipeline(left, right, cfg,
                                                     use_dtam=False))
        g = np.asarray(gt)
        m = np.isfinite(disp)
        m[:8] = m[-8:] = False
        m[:, :20] = m[:, -8:] = False
        assert np.median(np.abs(disp[m] - g[m])) < 1.0

        cfg2 = stereo_app.StereoConfig(max_disp=16, use_census=False,
                                       avg_rad=8, lr_check=True)
        disp2 = np.asarray(stereo_app.stereo_pipeline(left, right, cfg2,
                                                      use_dtam=False))
        m2 = np.isfinite(disp2)
        m2[:8] = m2[-8:] = False
        m2[:, :20] = m2[:, -8:] = False
        assert m2.any()
        assert np.median(np.abs(disp2[m2] - g[m2])) < 1.5

    def test_dtam_pipeline_runs_and_is_accurate(self):
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg = stereo_app.StereoConfig(
            max_disp=16, census_window="9x7", dtam_iterations=30,
            lam=20.0, lr_check=True,
        )
        disp = np.asarray(stereo_app.stereo_pipeline(left, right, cfg))
        g = np.asarray(gt)
        valid = np.isfinite(disp)
        inner = np.zeros_like(valid)
        inner[8:-8, 20:-8] = True
        m = valid & inner
        assert m.sum() / inner.sum() > 0.4
        assert np.median(np.abs(disp[m] - g[m])) < 1.5

    def test_wta_only_path(self):
        left, right, gt = synthetic.stereo_pair(64, 48, 8, seed=2)
        cfg = stereo_app.StereoConfig(max_disp=8, census_window="9x7", lr_check=False,
                                      median_its=1)
        disp = np.asarray(stereo_app.stereo_pipeline(left, right, cfg, use_dtam=False))
        g = np.asarray(gt)
        m = np.isfinite(disp)
        m[:6] = m[-6:] = False
        m[:, :12] = m[:, -6:] = False
        assert np.median(np.abs(disp[m] - g[m])) < 1.0

    def test_depth_and_cloud(self):
        K = kt.Intrinsics.centered(50.0, 32, 24)
        disp = jnp.full((24, 32), 20.0)
        depth, cloud = stereo_app.depth_and_cloud(disp, K, 0.1)
        np.testing.assert_allclose(np.asarray(depth), 50.0 * 0.1 / 20.0, rtol=1e-6)
        assert cloud.shape == (24, 32, 4)


class TestKinectFusionApp:
    # all three fuse/raycast engines must track (the 'guided' and 'exact'
    # configs are supported, not just the default plane-sweep — equal
    # app-level coverage per engine)
    @pytest.mark.parametrize("engine", ["separable", "guided", "exact"])
    def test_tracking_and_fusion_on_synthetic_orbit(self, engine):
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        cfg = kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
            engine=engine,
        )
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=64)
        poses = []
        ests = []
        for i, (T_wc, depth) in enumerate(
            synthetic.depth_sequence(4, K, W, H, scene=scene, step=0.015)
        ):
            depth = jnp.where(jnp.isfinite(depth), depth, 0.0)  # sensor-style zeros
            if i == 0:
                pipe.T_wl = T_wc  # bootstrap at true pose
            est = pipe.process_frame(depth)
            poses.append(np.asarray(T_wc))
            ests.append(np.asarray(est))
        assert pipe.tracking_good
        # translation drift should stay small vs true pose
        drift = np.abs(ests[-1] - poses[-1]).max()
        assert drift < 0.06
        assert float(pipe.vol.weight.max()) > 0

    def test_run_sequence_matches_per_frame_loop(self):
        """The one-dispatch scan replay (run_sequence) must track like the
        host loop: same frame step, so poses and the fused volume agree up
        to XLA fusion-order float noise."""
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        mk = lambda: kf.KinectFusion(K, kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
        ))
        scene = synthetic.sphere_scene(res=64)
        frames = list(synthetic.depth_sequence(4, K, W, H, scene=scene,
                                               step=0.015))
        depths = [jnp.where(jnp.isfinite(d), d, 0.0) for _, d in frames]

        loop = mk()
        loop.T_wl = frames[0][0]
        loop_poses = [np.asarray(loop.process_frame(d)) for d in depths]

        seq = mk()
        seq.T_wl = frames[0][0]
        poses, rmses = seq.run_sequence(jnp.stack(depths))
        assert poses.shape == (4, 3, 4) and rmses.shape == (4,)
        np.testing.assert_allclose(np.asarray(poses[-1]), loop_poses[-1],
                                   atol=1e-4)
        assert seq.frame == 4 and seq.tracking_good
        np.testing.assert_allclose(np.asarray(seq.vol.weight),
                                   np.asarray(loop.vol.weight), atol=1e-3)
        # resuming with more frames picks up where the scan left off: the
        # repeated frame re-tracks against the re-fused model, so the pose
        # legitimately shifts a little — assert continuity, not identity
        poses2, _ = seq.run_sequence(jnp.stack(depths[-1:]))
        assert seq.frame == 5 and seq.tracking_good
        np.testing.assert_allclose(np.asarray(poses2[-1]),
                                   np.asarray(poses[-1]), atol=0.05)

    def test_sequence_runner_scan_uses_fenced_bits_gathers(self):
        """The scan body traces with the 16-bit-halves gathers and the u16
        buffers are optimization_barrier-fenced — un-fenced, layout
        assignment relayout-copies the u16 intermediates every scan
        iteration (6.77 vs 4.14 ms/frame measured; sampling.take_f32 /
        _take_bits_fwd_impl docstrings). gather_bits stays a STATIC
        argument so jit's aval-keyed tracing cache cannot silently reuse a
        differently-routed trace."""
        import jax

        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        cfg = kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=64)
        (_, d0), = list(synthetic.depth_sequence(1, K, W, H, scene=scene))
        d0 = jnp.where(jnp.isfinite(d0), d0, 0.0)
        # standalone frame first: bits trace lands in the tracing cache
        pipe.process_frame(d0)
        runner = kf.make_sequence_runner(K, cfg, pipe.trunc_dist,
                                         sweep_axis=0)
        depths = jnp.stack([d0, d0])
        firsts = jnp.zeros(2, bool)
        jaxpr = str(jax.make_jaxpr(runner.__wrapped__)(
            pipe.vol.val, pipe.vol.weight, pipe.T_wl, depths, firsts,
            pipe.vol.bbox.lo, pipe.vol.bbox.hi))
        assert "bitcast_convert_type" in jaxpr
        assert "optimization_barrier" in jaxpr
        # while the standalone step does use the bit gather
        step = kf.make_frame_step(K, cfg, None, pipe.trunc_dist,
                                  sweep_axis=0)
        jaxpr_step = jax.make_jaxpr(step.__wrapped__)(
            pipe.vol.val, pipe.vol.weight, pipe.T_wl, d0,
            jnp.zeros((), bool), pipe.vol.bbox.lo, pipe.vol.bbox.hi)
        assert "bitcast_convert_type" in str(jaxpr_step)

    def test_run_sequence_picks_nonz_sweep_axis(self):
        """A sequence whose cameras look along world x must pin the x sweep
        (static axis, make_sequence_runner docstring) and still track like
        the per-frame 'auto'-axis loop — when every pose shares the
        dominant axis the pinned scan runs the same branch per frame."""
        import numpy as _np

        from kangaroo_tpu.fusion.separable import _view_axis_index

        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        mk = lambda: kf.KinectFusion(K, kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
        ))
        scene = synthetic.sphere_scene(res=64)
        from kangaroo_tpu.fusion import raycast as rc

        frames = []
        for i in range(3):
            T_wc = jnp.asarray(synthetic.orbit_pose(_np.pi / 2 + i * 0.015))
            d, _, _ = rc.raycast_sdf(scene, T_wc, K, W, H, near=0.5, far=8.0)
            frames.append((T_wc, jnp.where(jnp.isfinite(d), d, 0.0)))
        assert int(_view_axis_index(se3.inverse(frames[0][0]))) == 2

        loop = mk()
        loop.T_wl = frames[0][0]
        for _, d in frames:
            loop.process_frame(d)

        seq = mk()
        seq.T_wl = frames[0][0]
        poses, _ = seq.run_sequence(jnp.stack([d for _, d in frames]))
        assert seq._seq_axis == 2
        np.testing.assert_allclose(np.asarray(poses[-1]),
                                   np.asarray(loop.T_wl), atol=1e-4)
        np.testing.assert_allclose(np.asarray(seq.vol.weight),
                                   np.asarray(loop.vol.weight), atol=1e-3)

    def test_colour_one_jit_frame_tracks_and_fuses(self):
        """With use_colour and an rgb frame, process_frame takes the one-jit
        path (colour volume fused in the same jit as tracking, like
        main.cpp:355 fusing colour inside the frame loop)."""
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        cfg = kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
            use_colour=True, rgb_focal=55.0, rgb_baseline_m=0.0,
        )
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=64)
        rgb = jnp.full((H, W, 3), 180.0)
        frames = list(synthetic.depth_sequence(4, K, W, H, scene=scene,
                                               step=0.015))
        pipe.T_wl = frames[0][0]
        for T_wc, depth in frames:
            est = pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                                     rgb=rgb)
        assert pipe.tracking_good
        drift = np.abs(np.asarray(est) - np.asarray(frames[-1][0])).max()
        assert drift < 0.06
        fused = np.asarray(pipe.color_vol.data)
        touched = np.asarray(pipe.vol.weight) > 0
        assert touched.any()
        assert abs(np.median(fused[touched]) - 180.0 / 255.0) < 0.2

    def test_colour_run_sequence_matches_per_frame(self):
        """The colour sequence replay scans (depth, rgb) pairs and matches
        the per-frame one-jit colour loop."""
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        mk = lambda: kf.KinectFusion(K, kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
            use_colour=True, rgb_focal=55.0, rgb_baseline_m=0.0,
        ))
        scene = synthetic.sphere_scene(res=64)
        rgb = jnp.full((H, W, 3), 140.0)
        frames = list(synthetic.depth_sequence(3, K, W, H, scene=scene,
                                               step=0.015))
        depths = [jnp.where(jnp.isfinite(d), d, 0.0) for _, d in frames]

        loop = mk()
        loop.T_wl = frames[0][0]
        for d in depths:
            est_loop = loop.process_frame(d, rgb=rgb)

        seq = mk()
        seq.T_wl = frames[0][0]
        poses, rmses = seq.run_sequence(
            jnp.stack(depths), rgbs=jnp.stack([rgb] * len(depths)))
        np.testing.assert_allclose(np.asarray(poses[-1]),
                                   np.asarray(est_loop), atol=1e-4)
        np.testing.assert_allclose(np.asarray(seq.color_vol.data),
                                   np.asarray(loop.color_vol.data), atol=1e-3)

    def test_divergence_resets_and_refuses_current_frame(self):
        """A frame with zero valid ICP correspondences yields a non-finite
        rmse (sqrt(0/0)); the app must reset AND fuse the current frame into
        the fresh volume, like main.cpp:224-241 ('Fuse first kinect frame
        in.'), resuming tracking immediately instead of dropping frames."""
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=2, its=(1, 1), near=0.5, far=6.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        frames = list(synthetic.depth_sequence(2, K, W, H, scene=scene, step=0.01))
        T0, d0 = frames[0]
        pipe.T_wl = T0
        pipe.process_frame(jnp.where(jnp.isfinite(d0), d0, 0.0))
        assert float(pipe.vol.weight.max()) > 0

        # all-invalid depth: bilateral minval masks everything -> obs == 0
        pipe.process_frame(jnp.zeros((H, W)))
        assert not np.isfinite(pipe.rmse)
        assert pipe.tracking_good  # reset leaves tracking live
        # pose reset to identity; the (empty) frame was fused into a fresh
        # volume, so no stale geometry survives
        np.testing.assert_array_equal(np.asarray(pipe.T_wl),
                                      np.asarray(se3.identity()))
        assert float(pipe.vol.weight.max()) == 0.0

        # the next valid frame re-seeds the model through the same path
        # (ICP against the empty model is again obs == 0 -> reset + fuse)
        T1, d1 = frames[1]
        pipe.T_wl = T1
        pipe.process_frame(jnp.where(jnp.isfinite(d1), d1, 0.0))
        assert float(pipe.vol.weight.max()) > 0

    def test_moving_volume_follows_camera(self):
        """Opt-in moving workspace: the volume rolls to keep the camera's
        look-at point centred, preserving overlapping fused geometry."""
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=1, its=(1,), near=0.5,
                                    far=6.0, moving_threshold_voxels=2,
                                    moving_lead_m=3.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        for T_wc, depth in synthetic.depth_sequence(1, K, W, H, scene=scene):
            pipe.T_wl = T_wc
            pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                               pose_refinement=False)
        w_before = float(pipe.vol.weight.sum())
        assert w_before > 0
        lo0 = np.asarray(pipe.vol.bbox.lo).copy()
        # shift the camera sideways: the look-at target drifts with it and
        # the next frame's _maybe_roll re-centres the window
        pipe.T_wl = pipe.T_wl.at[0, 3].add(0.6)
        pipe._maybe_roll()
        lo1 = np.asarray(pipe.vol.bbox.lo)
        assert lo1[0] > lo0[0] + 0.3  # rolled toward +x
        # overlapping fused geometry survived the roll
        assert float(pipe.vol.weight.sum()) > 0.2 * w_before
        # and the world positions of surviving weight are consistent: the
        # volume still renders
        d, n, _ = pipe.render(T_wc=pipe.T_wl.at[0, 3].add(-0.6))
        assert np.isfinite(np.asarray(d)).any()

    def test_reset_clears_colour_volume(self):
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=1, its=(1,), near=0.5, far=6.0,
                                    use_colour=True, rgb_focal=40.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        rgb = jnp.full((H, W, 3), 200.0)
        for T_wc, depth in synthetic.depth_sequence(1, K, W, H, scene=scene):
            pipe.T_wl = T_wc
            pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                               rgb=rgb, pose_refinement=False)
        assert (np.asarray(pipe.color_vol.data) != 0.5).any()
        pipe.reset()
        # SdfReset(colorVol) refills 0.5 (cu_sdffusion.cu:166-169)
        np.testing.assert_array_equal(np.asarray(pipe.color_vol.data), 0.5)
        assert float(pipe.vol.weight.max()) == 0.0

    def test_colour_fusion_and_render(self):
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=1, its=(1,), near=0.5, far=6.0,
                                    use_colour=True, rgb_focal=40.0,
                                    rgb_baseline_m=0.05)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        rgb = jnp.full((H, W, 3), 180.0)
        for i, (T_wc, depth) in enumerate(
            synthetic.depth_sequence(3, K, W, H, scene=scene, step=0.8)
        ):
            pipe.T_wl = T_wc
            pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                               rgb=rgb, pose_refinement=False)
        assert float(pipe.vol.weight.max()) > 0
        fused = np.asarray(pipe.color_vol.data)
        touched = np.asarray(pipe.vol.weight) > 0
        assert touched.any()
        # grey 180/255 blended over the 0.5 reset value
        assert abs(np.median(fused[touched]) - 180.0 / 255.0) < 0.2
        d, n, img = pipe.render(show_colour=True)
        hit = np.isfinite(np.asarray(d))
        assert hit.any()
        vals = np.asarray(img)[hit]
        assert abs(np.median(vals) - 180.0 / 255.0) < 0.2

    def test_keyframe_texturing(self):
        # 'Save KF' + viewonly TextureDepth over Mat<ImageKeyframe,10>
        # (main.cpp:196-200, 253-270): saved keyframes texture the render;
        # with none saved the phong shading shows through.
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=1, its=(1,), near=0.5, far=6.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        for T_wc, depth in synthetic.depth_sequence(2, K, W, H, scene=scene,
                                                    step=0.2):
            pipe.T_wl = T_wc
            pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                               pose_refinement=False)
        d0, _, rgba0 = pipe.render_textured()
        assert rgba0.shape == (H, W, 4)
        pipe.save_keyframe(jnp.full((H, W), 210.0))
        assert len(pipe.keyframes) == 1
        d, n, rgba = pipe.render_textured()
        hit = np.isfinite(np.asarray(d))
        assert hit.any()
        vals = np.asarray(rgba)[..., 0][hit]
        # surface seen by the keyframe takes its (grey 210/255) colour
        assert abs(np.median(vals) - 210.0 / 255.0) < 0.1
        pipe.reset()  # keyframes.clear() (main.cpp:228)
        assert pipe.keyframes == []

    def test_render_and_mesh(self, tmp_path):
        W, H = 48, 36
        K = kt.Intrinsics.centered(40.0, W, H)
        cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=32, vol_extent=1.2,
                                    max_levels=1, its=(1,), near=0.5, far=6.0)
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=48)
        for i, (T_wc, depth) in enumerate(
            synthetic.depth_sequence(3, K, W, H, scene=scene, step=0.8)
        ):
            pipe.T_wl = T_wc
            pipe.process_frame(jnp.where(jnp.isfinite(depth), depth, 0.0),
                               pose_refinement=False)
        d, n, img = pipe.render()
        assert np.isfinite(np.asarray(d)).any()
        tris = pipe.save_mesh(str(tmp_path / "m.ply"))
        assert len(tris) > 0
        pipe.save_volume(str(tmp_path / "save.vol"))
        pipe.load_volume(str(tmp_path / "save.vol"))


class TestStereo2Tail:
    """The stereo2 app tail: disparity -> vbo -> PlaneFitGN -> heightmap
    fusion (stereo2/main.cpp:503-536) composed end-to-end."""

    def test_plane_fit_and_heightmap(self):
        W, H, D = 128, 96, 32
        left, right, gt = synthetic.stereo_pair(W, H, D, seed=1)
        K = kt.Intrinsics.centered(100.0, W, H)
        # background disp D//4 = 8 -> depth fu*b/8 = 2.5 — OUTSIDE the
        # Tukey basin of the fixed initial plane z = 1/5 (main.cpp:132):
        # the annealed reset schedule must still capture it. The box at
        # depth 0.83 is the outlier the robust fit must reject.
        baseline = 0.2
        app = stereo_sgm.Stereo2App(
            K, baseline,
            stereo_sgm.SgmConfig(max_disp=D, census_window="9x7"),
            hm_size=(8.0, 8.0), hm_cell=0.1, min_disp=1.0)
        disp, d3d = app(left, right)
        n = np.asarray(app.n_c)
        z_plane = -1.0 / n[2]
        assert abs(z_plane - 2.5) < 0.2, n
        assert abs(n[0]) < 0.05 and abs(n[1]) < 0.05
        # heightmap initialised from the plane and fused real cells
        vbo, img = app.hm.world_vbo()
        finite = np.isfinite(np.asarray(vbo)[..., 2])
        assert finite.sum() > 50
        # fused heights sit near the plane (height ~0 in plane frame):
        # cells hit by background points dominate
        heights = np.asarray(app.hm.hm[..., 0])
        counts = np.asarray(app.hm.hm[..., 1])
        hit = counts > 0
        med = np.median(np.abs(heights[hit] / counts[hit]))
        assert med < 0.2
        # second frame: persistent plane state keeps refining without reset
        z_before = np.asarray(app.z).copy()
        app(left, right)
        assert app.z is not None and np.all(np.isfinite(np.asarray(app.z)))
        assert np.allclose(np.asarray(app.z), z_before, rtol=0.2)


class TestMultiViewStereo:
    """CostVolElem accumulation driver (stereo2/main.cpp:462-486): a posed
    two-view sequence through cost_volume_add reproduces stereo matching."""

    def test_accumulated_volume_recovers_disparity(self):
        W, H, D = 96, 64, 16
        left, right, gt = synthetic.stereo_pair(W, H, D, seed=2)
        K = kt.Intrinsics.centered(100.0, W, H)
        b = 0.3
        mvs = stereo_app.MultiViewStereo(K, b, stereo_app.StereoConfig(
            max_disp=D, dtam_iterations=20))
        mvs.reset(left.astype(jnp.float32), se3.identity())
        # contributing camera sits at +baseline along x in the keyframe
        # frame — exactly the rectified-stereo geometry
        T_wc = se3.make(np.eye(3), [b, 0.0, 0.0])
        n1, _ = mvs.add(right.astype(jnp.float32), T_wc)
        disp = np.asarray(mvs.solve(use_dtam=False))
        g = np.asarray(gt)
        m = np.isfinite(disp) & (np.arange(W)[None, :] >= D)
        err = np.abs(disp[m] - g[m])
        assert np.median(err) < 0.75
        assert (err < 1.5).mean() > 0.8
        # adding the same view again only deepens the running mean: the
        # CostVolElem (n, sum) semantics keep the extracted cost identical
        n2, s2 = mvs.add(right.astype(jnp.float32), T_wc)
        assert float(jnp.max(n2)) == 2 * float(jnp.max(n1))
        disp2 = np.asarray(mvs.solve(use_dtam=False))
        np.testing.assert_allclose(disp2[m], disp[m], atol=1e-4)

    def test_stereo_seed_and_dtam_solve(self):
        W, H, D = 96, 64, 16
        left, right, gt = synthetic.stereo_pair(W, H, D, seed=3)
        K = kt.Intrinsics.centered(100.0, W, H)
        b = 0.3
        mvs = stereo_app.MultiViewStereo(K, b, stereo_app.StereoConfig(
            max_disp=D, dtam_iterations=30))
        # costvol_reset_stereo: seed the accumulator from the pair itself
        mvs.reset(left.astype(jnp.float32), se3.identity(),
                  right=right.astype(jnp.float32))
        assert float(jnp.max(mvs.n)) >= 1.0
        mvs.add(right.astype(jnp.float32), se3.make(np.eye(3), [b, 0.0, 0.0]))
        disp = np.asarray(mvs.solve(use_dtam=True))
        g = np.asarray(gt)
        m = np.isfinite(disp) & (np.arange(W)[None, :] >= D)
        assert np.median(np.abs(disp[m] - g[m])) < 1.0


class TestQuantitativeGates:
    """End-to-end numeric gates (VERDICT r2 #8): trajectory ATE for the
    KinectFusion tracker over a longer orbit, and a fused-mesh vertex
    distance bound against the analytic SDF (the SdfFusion.cpp:130-135
    self-test done quantitatively)."""

    def test_kinectfusion_orbit_ate(self):
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        cfg = kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
        )
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=64)
        t_err, r_err = [], []
        n_frames = 10
        for i, (T_wc, depth) in enumerate(
            synthetic.depth_sequence(n_frames, K, W, H, scene=scene,
                                     step=0.012)
        ):
            depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
            if i == 0:
                pipe.T_wl = T_wc
            est = np.asarray(pipe.process_frame(depth))
            gt = np.asarray(T_wc)
            t_err.append(np.linalg.norm(est[:, 3] - gt[:, 3]))
            cosang = (np.trace(est[:, :3].T @ gt[:, :3]) - 1.0) / 2.0
            r_err.append(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
        assert pipe.tracking_good
        ate = float(np.sqrt(np.mean(np.square(t_err))))
        # orbit spans ~0.12 rad at radius 3 (~0.36 units of camera motion);
        # the tracker must hold absolute trajectory error well under a voxel
        # (2.4/47 = 0.051) on average and bounded rotation drift
        assert ate < 0.04, (ate, t_err)
        assert max(t_err) < 0.08, t_err
        assert max(r_err) < 2.0, r_err

    def test_kinect_noise_orbit_and_gate_recovery(self):
        """The bench's robustness block at test scale (bench.py
        quality_metrics *_noisy / gate demo): tracking holds under
        synthetic.kinect_noise corruption (quadratic axial noise, 1/8-px
        quantisation, clumped NaN dropout), the rmse gate fires on an
        injected garbage frame WITHOUT moving the pose, and tracking
        recovers on the following clean frames
        (kinectfusion/main.cpp:320-346 semantics)."""
        W, H = 64, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        cfg = kf.KinectFusionConfig(
            w=W, h=H, vol_res=48, vol_extent=1.2, max_levels=2, its=(2, 2),
            near=0.5, far=6.0, max_rmse=0.3, bilateral_minval=0.2,
        )
        pipe = kf.KinectFusion(K, cfg)
        scene = synthetic.sphere_scene(res=64)
        frames = list(synthetic.depth_sequence(8, K, W, H, scene=scene,
                                               step=0.012))
        rng_g = np.random.default_rng(7)
        garbage = jnp.asarray(
            (1.0 + 2.0 * rng_g.random((H, W))).astype(np.float32))
        fired = pose_held = None
        t_err = []
        for i, (T_wc, depth) in enumerate(frames):
            noisy = synthetic.kinect_noise(depth, seed=100 + i,
                                           f=55.0, baseline=0.3)
            noisy = jnp.where(jnp.isfinite(noisy), noisy, 0.0)
            if i == 0:
                pipe.T_wl = T_wc
            if i == 4:
                before = np.asarray(pipe.T_wl)
                pipe.process_frame(garbage)
                fired = not pipe.tracking_good
                pose_held = bool(np.array_equal(np.asarray(pipe.T_wl),
                                                before))
            est = np.asarray(pipe.process_frame(noisy))
            t_err.append(np.linalg.norm(est[:, 3] - np.asarray(T_wc)[:, 3]))
        assert fired, "rmse gate did not fire on the garbage frame"
        assert pose_held, "gated frame must not move the pose"
        assert pipe.tracking_good
        # noise-corrupted tracking: bounded, non-diverging drift. At this
        # test scale the quantisation step alone is dz = z^2/(8 f b)
        # ~ 0.07 per 1/8 px, so the floor is ~2 voxels; the claim here is
        # the CODE PATH + gate semantics (precision is the TPU bench's
        # VGA-scale job, bench.py kinectfusion_noisy_*)
        assert t_err[-1] < 0.15, t_err
        assert float(np.sqrt(np.mean(np.square(t_err)))) < 0.12, t_err

    def test_fused_mesh_vertex_distance_to_analytic_sdf(self):
        from kangaroo_tpu.fusion import marching_cubes as mc
        from kangaroo_tpu.fusion import raycast as rc
        from kangaroo_tpu.fusion import sdf as sdf_mod
        from kangaroo_tpu.geometry import depth as depth_mod

        W, H, R = 64, 48, 48
        K = kt.Intrinsics.centered(55.0, W, H)
        bbox = kt.BoundingBox.create((-1.2, -1.2, -1.2), (1.2, 1.2, 1.2))
        trunc = 0.15
        vol = kt.TsdfVolume.create(R, R, R, bbox, trunc_dist=trunc)
        for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            c, s = np.cos(ang), np.sin(ang)
            Rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            T_wc = se3.make(Rm, Rm @ np.array([0, 0, -3.0], np.float32))
            prev = jnp.full((H, W), jnp.nan)
            gt_depth, _ = rc.raycast_sphere(prev, T_wc, K, (0, 0, 0), 0.9, W, H)
            vbo = depth_mod.depth_to_vbo(gt_depth, K)
            norm = depth_mod.normals_from_vbo(vbo)
            vol = sdf_mod.sdf_fuse(vol, gt_depth, norm, se3.inverse(T_wc), K,
                                   trunc, 1000.0, 0.1)
        tris = mc.extract_mesh(vol, weight_min=0.5)
        verts = np.asarray(tris).reshape(-1, 3)
        assert len(verts) > 3000
        # every mesh vertex must lie on the analytic sphere |v| = 0.9 to
        # within half a voxel (2.4/47 = 0.051); the median far tighter
        dist = np.abs(np.linalg.norm(verts, axis=1) - 0.9)
        voxel = 2.4 / (R - 1)
        assert np.median(dist) < 0.15 * voxel, np.median(dist) / voxel
        assert np.percentile(dist, 99) < 0.5 * voxel
        assert dist.max() < 1.0 * voxel


class TestVariationalStereoIncremental:
    def test_incremental_converges_like_cold_solve(self):
        """10 frames x 5 iterations of the reference's incremental schedule
        (VariationalStereo) reach the cold 50-iteration solve's disparity:
        the per-frame state carry-over loses nothing (the theta trajectory
        differs by one annealing factor, ~1e-5 relative)."""
        left, right, gt = synthetic.stereo_pair(96, 64, 16, seed=0)
        cfg = stereo_app.StereoConfig(max_disp=16, census_window="9x7",
                                      dtam_iterations=50)
        cold = np.asarray(stereo_app.stereo_pipeline(left, right, cfg))

        inc = stereo_app.VariationalStereo(cfg, its_per_frame=5)
        for _ in range(10):
            disp = inc.process_frame(left, right)
        d = np.asarray(disp)
        both = np.isfinite(cold) & np.isfinite(d)
        assert both.mean() > 0.5
        assert np.median(np.abs(cold[both] - d[both])) < 0.02
        # and the accuracy holds vs ground truth
        g = np.asarray(gt)
        inner = np.zeros_like(g, bool)
        inner[8:-8, 20:-8] = True
        m = np.isfinite(d) & inner
        assert np.median(np.abs(d[m] - g[m])) < 1.5
        assert float(inc.theta) < 100.0  # annealing advanced across frames

    def test_reset_and_converged_gate(self):
        left, right, _ = synthetic.stereo_pair(48, 32, 8, seed=1)
        cfg = stereo_app.StereoConfig(max_disp=8, census_window="9x7",
                                      lr_check=False, median_its=0)
        inc = stereo_app.VariationalStereo(cfg, its_per_frame=2,
                                           min_theta=99.9999)
        inc.process_frame(left, right)
        th1 = inc.theta
        # theta dropped below min_theta after frame 1 -> frame 2 iterates 0x
        inc.process_frame(left, right)
        assert inc.theta == th1
        inc.reset()
        assert inc.state is None
