"""Per-stage timing of the one-jit KinectFusion frame on the real TPU.

Breaks make_frame_step into its stages (preprocess, raycast, pyramid+vbo,
ICP per level, fuse) and times each with utils.timing.time_fn so we know
where the gap between fuse+raycast (bench_fusion) and the full frame goes.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf
from kangaroo_tpu.apps import synthetic
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import separable as sep
from kangaroo_tpu.geometry import depth as depth_mod
from kangaroo_tpu.containers import pyramid as pyr_mod
from kangaroo_tpu.solvers import icp as icp_mod
from kangaroo_tpu.utils.timing import time_fn

W, H = 640, 480
K = kt.Intrinsics.centered(550.0, W, H)
cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=256, vol_extent=1.2,
                            max_levels=4, its=(1, 0, 2, 3),
                            near=0.5, far=6.0)
pipe = kf.KinectFusion(K, cfg)
scene = synthetic.sphere_scene(res=128)
frames = list(synthetic.depth_sequence(2, K, W, H, scene=scene, step=0.01))
T0, d0 = frames[0]
pipe.T_wl = jnp.asarray(T0)
d0 = jnp.where(jnp.isfinite(d0), d0, 0.0)
pipe.process_frame(d0)
_, d1 = frames[1]
d1 = jnp.where(jnp.isfinite(d1), d1, 0.0)

val, weight = pipe.vol.val, pipe.vol.weight
bbox = pipe.vol.bbox
T_wl = pipe.T_wl
trunc = pipe.trunc_dist
vol = kt.TsdfVolume(val, weight, bbox)

def report(name, fn, *args, iters=8):
    ms = 1e3 * time_fn(fn, *args, iters=iters)
    print(f"{name:42s} {ms:8.2f} ms")
    return ms

# stage 1: preprocess (bilateral + pyramid + vbo/normals)
def preprocess(depth_raw):
    _, kin_v, kin_n = kf.preprocess_depth(depth_raw, K, cfg)
    return kin_v[0]

report("preprocess (bilateral+pyr+vbo+normals)", preprocess, d1)

# stage 2: full-res raycast (separable)
def raycast(v, w_):
    vol2 = kt.TsdfVolume(v, w_, bbox)
    d, n, _ = sep.raycast_sdf_separable(vol2, T_wl, K, W, H, cfg.near,
                                        cfg.far, trunc_dist=trunc, shade=False)
    return d

report("raycast full-res (separable)", raycast, val, weight)

# stage 3: raycast pyramid + vbo/normals
def ray_pyr(v, w_):
    vol2 = kt.TsdfVolume(v, w_, bbox)
    d0_, _, _ = sep.raycast_sdf_separable(vol2, T_wl, K, W, H, cfg.near,
                                          cfg.far, trunc_dist=trunc, shade=False)
    d_pyr = pyr_mod.box_reduce_ignore_invalid(d0_, cfg.max_levels)
    outs = []
    for l in range(cfg.max_levels):
        if cfg.its[l] == 0:
            continue
        vl = depth_mod.depth_to_vbo(d_pyr[l], K.level(l))
        outs.append(depth_mod.normals_from_vbo(vl)[0, 0, 0])
    return jnp.stack(outs)

report("raycast + pyramid + vbo/normals", ray_pyr, val, weight)

# stage 4: single ICP system build at each level
_, kin_v, kin_n = kf.preprocess_depth(d1, K, cfg)
d0_, _, _ = sep.raycast_sdf_separable(vol, T_wl, K, W, H, cfg.near, cfg.far,
                                      trunc_dist=trunc, shade=False)
d_pyr = pyr_mod.box_reduce_ignore_invalid(d0_, cfg.max_levels)
for l in (0, 2, 3):
    Kl = jnp.asarray(np.asarray(K.level(l).matrix()))
    vl = depth_mod.depth_to_vbo(d_pyr[l], K.level(l))
    nl = depth_mod.normals_from_vbo(vl)

    def icp_build(kv, rv, rn, Kl=Kl):
        s = icp_mod.icp_point_plane(kv, rv, rn, Kl @ se3.identity(),
                                    se3.identity(), cfg.icp_c)
        return s.JTJ

    report(f"icp system build level {l} ({W>>l}x{H>>l})", icp_build,
           kin_v[l], vl, nl, iters=16)

# stage 5: fuse
def fuse(v, w_, kd, kn):
    vol2 = kt.TsdfVolume(v, w_, bbox)
    f = sep.sdf_fuse_separable(vol2, kd, kn, se3.inverse(T_wl), K, trunc,
                               cfg.max_w, cfg.min_cos_theta)
    return f.val

report("fuse (separable)", fuse, val, weight, kin_v[0][..., 2], kin_n[0])

# whole frame for reference
step = pipe._step
lo, hi = bbox.lo, bbox.hi

def frame(v, w_, T, depth):
    return step(v, w_, T, depth, jnp.asarray(False), lo, hi)

report("FULL frame (one jit)", frame, val, weight, T_wl, d1)
