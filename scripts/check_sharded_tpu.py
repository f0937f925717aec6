"""Sharded-SGM on the real TPU: a 1-device Mesh exercises the exact
shard_map + Pallas composition that multi-chip deployment uses.

Mosaic kernels cannot compile on the virtual CPU test mesh (test_parallel
covers the XLA path there), so this script is the hardware-facing half of
the sharded equality suite: it proves the horizontal-path Pallas kernel
lowers and matches inside shard_map on a TPU device mesh.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.parallel import mesh as mesh_mod
from kangaroo_tpu.parallel import sharding
from kangaroo_tpu.stereo import sgm as sx
from kangaroo_tpu.utils.timing import time_fn

D, H, W = 64, 480, 640
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
img = jnp.asarray(rng.random((H, W)).astype(np.float32))
mesh = mesh_mod.make_mesh(1)

got = np.asarray(
    sharding.sharded_semi_global_matching(vol, img, 0.01, 0.02, mesh))
want = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02))
d = np.arange(D)[:, None, None]
x = np.arange(W)[None, None, :]
m = np.broadcast_to(d <= x, (D, H, W))
err = np.abs(got[m] - want[m])
rel = err / np.maximum(np.abs(want[m]), 1.0)
print(f"sharded(1-dev TPU mesh) vs single-device XLA: max err {err.max():.2e} "
      f"(rel {rel.max():.2e})")
assert rel.max() < 1e-3, rel.max()

ms = 1e3 * time_fn(
    lambda v, i: sharding.sharded_semi_global_matching(v, i, 0.01, 0.02, mesh),
    vol, img, iters=20)
print(f"sharded SGM (1 shard, VGA/64) on TPU: {ms:.2f} ms "
      "(horizontal AND vertical recurrences run the Pallas kernel; the "
      "vertical wavefront's block segments chain the cross-shard carry "
      "through sgm_aggregate_block)")

got8 = np.asarray(
    sharding.sharded_semi_global_matching(vol, img, 0.01, 0.02, mesh,
                                          do_diagonal=True))
want8 = np.asarray(sx.semi_global_matching(vol, img, 0.01, 0.02,
                                           do_diagonal=True))
err8 = np.abs(got8[m] - want8[m]) / np.maximum(np.abs(want8[m]), 1.0)
print(f"8-path wavefront vs single-device XLA: rel err {err8.max():.2e}")
assert err8.max() < 1e-3, err8.max()

ms8 = 1e3 * time_fn(
    lambda v, i: sharding.sharded_semi_global_matching(
        v, i, 0.01, 0.02, mesh, do_diagonal=True),
    vol, img, iters=20)
print(f"8-path wavefront SGM (1 shard, VGA/64) on TPU: {ms8:.2f} ms "
      "(all six row-major directions are Pallas carry segments; the "
      "diagonals pass dx=+-1 straight to the kernel)")

got_r = np.asarray(
    sharding.sharded_semi_global_matching_reshard(vol, img, 0.01, 0.02, mesh))
err_r = np.abs(got_r[m] - want[m]) / np.maximum(np.abs(want[m]), 1.0)
print(f"reshard strategy vs single-device XLA: rel err {err_r.max():.2e}")
assert err_r.max() < 1e-3, err_r.max()

ms_r = 1e3 * time_fn(
    lambda v, i: sharding.sharded_semi_global_matching_reshard(
        v, i, 0.01, 0.02, mesh),
    vol, img, iters=50)
print(f"reshard-strategy SGM (1 shard, VGA/64) on TPU: {ms_r:.2f} ms "
      "(every recurrence is the Pallas kernel; per-chip work divides by "
      "the shard count on a real mesh, plus two all_to_alls)")

# ---- app-level mesh paths on the 1-device TPU mesh: the packaged
# sgm_pipeline(mesh=) and KinectFusion(mesh=) compositions (shard_map
# inside the full jitted frames, Pallas kernels inside shard_map)
from kangaroo_tpu.apps import stereo_sgm as sgm_app

left = jnp.asarray((rng.random((H, W)) * 255).astype(np.uint8))
right = jnp.asarray((rng.random((H, W)) * 255).astype(np.uint8))
cfg = sgm_app.SgmConfig(max_disp=64, census_window="9x7")
da = np.asarray(sgm_app.sgm_pipeline(left, right, cfg))
db = np.asarray(sgm_app.sgm_pipeline(left, right, cfg, mesh=mesh))
nan = np.isnan(da) & np.isnan(db)
close = nan | (np.abs(da - db) < 0.1)
print(f"sgm_pipeline(mesh=1-dev) vs single-device: {close.mean():.4f} "
      "near-equal")
assert close.mean() > 0.99

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf_app
from kangaroo_tpu.apps import synthetic

Wk, Hk = 160, 120
Kk = kt.Intrinsics.centered(Wk * 0.9, Wk, Hk)
kcfg = kf_app.KinectFusionConfig(
    w=Wk, h=Hk, vol_res=96, vol_extent=1.2, max_levels=2, its=(2, 2),
    near=0.5, far=6.0, max_rmse=0.3, raycast_downsample=True)
scene = synthetic.sphere_scene(res=96)
frames = list(synthetic.depth_sequence(3, Kk, Wk, Hk, scene=scene,
                                       step=0.015))
pipe = kf_app.KinectFusion(Kk, kcfg, mesh=mesh)
pipe.T_wl = frames[0][0]
poses, rmses = pipe.run_sequence(jnp.stack(
    [jnp.where(jnp.isfinite(d), d, 0.0) for _, d in frames]))
drift = float(np.abs(np.asarray(poses[-1]) - np.asarray(frames[-1][0])).max())
print(f"KinectFusion(mesh=1-dev) run_sequence: drift {drift:.4f}, "
      f"rmse {float(rmses[-1]):.4f}")
assert drift < 0.08 and pipe.tracking_good
print("OK")
