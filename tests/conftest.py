"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so tests exercise sharding on
XLA's host platform with 8 virtual devices; the same Mesh code runs unchanged
on real ICI-connected chips. The axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so we force the platform through jax.config instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Most of the suite's wall time is XLA:CPU compilation; the persistent
# cache cuts a warm re-run to a fraction of the cold one (the cache is
# keyed on HLO + flags, so the 8-device mesh programs cache too).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The smoke tier (VERDICT r4 next #8): `-m 'not slow and not heavy'` is the
# CI-style command that covers every subsystem in < 15 min cold-cache on this
# one-core box (measured 2026-08-20: full suite 24:48, heavy set 8:23 of it).
# `heavy` marks long-running INTEGRATION tests whose subsystem keeps a cheaper
# representative in the smoke tier (each entry notes it); `slow` (see
# pyproject) stays the production-scale marker. Centralised here instead of
# per-file decorators so the tier is auditable in one place; the rot guard
# below fails the suite if an entry stops matching a collected test.
HEAVY = {
    # frame_parallel: smoke keeps test_frame_parallel_smoke_census_wta
    "tests/test_fast_paths.py::TestFrameParallel::test_batch_matches_single",
    # sharded KF app: smoke keeps test_mesh_parallel_run_sequence
    "tests/test_parallel.py::TestShardedKinectFusionApp::test_mesh_parallel_app_tracks_orbit",
    "tests/test_parallel.py::TestShardedKinectFusionApp::test_mesh_parallel_colour_fusion",
    "tests/test_parallel.py::TestShardedKinectFusionApp::test_mesh_parallel_colour_run_sequence",
    # bench replica: the bench itself runs this config every round
    "tests/test_misc_coverage.py::TestBenchSequenceConfig::test_bench_kf_sequence_runs_small",
    # KF app: smoke keeps orbit[exact] plus TestQuantitativeGates'
    # orbit-ATE (default = separable engine) and noise/rmse-gate tests,
    # the small colour tests (colour_fusion_and_render,
    # reset_clears_colour_volume), and test_rolling_and_network for the
    # moving-volume path
    "tests/test_apps.py::TestKinectFusionApp::test_run_sequence_matches_per_frame_loop",
    "tests/test_apps.py::TestKinectFusionApp::test_run_sequence_picks_nonz_sweep_axis",
    "tests/test_apps.py::TestKinectFusionApp::test_colour_run_sequence_matches_per_frame",
    "tests/test_apps.py::TestKinectFusionApp::test_tracking_and_fusion_on_synthetic_orbit[guided]",
    "tests/test_apps.py::TestKinectFusionApp::test_tracking_and_fusion_on_synthetic_orbit[separable]",
    "tests/test_apps.py::TestKinectFusionApp::test_divergence_resets_and_refuses_current_frame",
    "tests/test_apps.py::TestKinectFusionApp::test_sequence_runner_scan_uses_fenced_bits_gathers",
    "tests/test_apps.py::TestKinectFusionApp::test_colour_one_jit_frame_tracks_and_fuses",
    "tests/test_apps.py::TestKinectFusionApp::test_moving_volume_follows_camera",
    # separable dispatch gate: smoke keeps test_near_far_crop_falls_through_to_xla
    "tests/test_separable.py::TestPallasFuse::test_enable_gate_passthrough",
    # stacked/batched SGM: smoke keeps test_stacked_frames_equal_per_frame
    "tests/test_pallas_kernels.py::TestSgmStackedSeams::test_batched_pipeline_matches_per_frame",
    # wavefront interpret: smoke keeps [16-True] and [20-False] (both flag
    # values, both sizes)
    "tests/test_pallas_kernels.py::TestShardedWavefrontInterpret::test_use_kv_wavefront_matches_xla[20-True]",
    "tests/test_pallas_kernels.py::TestShardedWavefrontInterpret::test_use_kv_wavefront_matches_xla[16-False]",
    # pose-graph: smoke keeps the solver/loop-closure tests in
    # test_geometry_extra; this one exercises the background thread
    "tests/test_host_glue.py::TestPoseGraphBackground::test_background_solve_converges",
    # sharded fusion: smoke keeps the separable fuse/raycast + icp variants
    "tests/test_parallel.py::TestShardedFusion::test_sharded_fuse_matches_single",
    # sharded SGM app: smoke keeps [False] (4-path reshard strategy)
    "tests/test_parallel.py::TestShardedSgmApp::test_pipeline_matches_single_device[True]",
    # MC256: smoke keeps the native-vs-numpy + watertight-sphere tests
    "tests/test_mesh_heightmap.py::TestMarchingCubes256::test_hausdorff_vs_marching_tets",
}


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        if item.nodeid in HEAVY:
            item.add_marker(pytest.mark.heavy)
            seen.add(item.nodeid)
    # Rot guard: on a full-suite collection every HEAVY entry must resolve
    # (single-file runs collect fewer items and skip the check).
    if len(items) > 300:
        stale = HEAVY - seen
        assert not stale, f"conftest HEAVY entries match no test: {stale}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
