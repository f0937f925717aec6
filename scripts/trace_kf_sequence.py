"""Op-level xplane trace of the whole-sequence KinectFusion scan replay.

Same recipe as scripts/trace_kf_ops.py but for make_sequence_runner's
lax.scan program: the scan body compiles once, so the per-op totals divide
by n_frames. Used to find why the scan body pays more than the standalone
one-jit frame (relayout copies around the scan carry are the usual suspect
— see docs/PERF.md 'scan-carry layout leak').
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf
from kangaroo_tpu.apps import synthetic
from kangaroo_tpu.fusion import separable as sep

from trace_kf_ops import LOGDIR, report, run_and_trace

N_FRAMES = 8


def build_run():
    W, H = 640, 480
    K = kt.Intrinsics.centered(550.0, W, H)
    cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=256, vol_extent=1.2,
                                max_levels=4, its=(1, 0, 2, 3),
                                near=0.5, far=6.0)
    pipe = kf.KinectFusion(K, cfg)
    scene = synthetic.sphere_scene(res=128)
    frames = list(synthetic.depth_sequence(N_FRAMES + 1, K, W, H,
                                           scene=scene, step=0.01))
    T0, d0 = frames[0]
    pipe.T_wl = jnp.asarray(T0)
    d0 = jnp.where(jnp.isfinite(d0), d0, 0.0)
    pipe.process_frame(d0)
    depths = jnp.stack([jnp.where(jnp.isfinite(d), d, 0.0)
                        for _, d in frames[1:]])
    firsts = jnp.zeros(N_FRAMES, bool)
    axis = sep._view_axis_index(np.asarray(pipe.T_wl))
    runner = kf.make_sequence_runner(K, cfg, pipe.trunc_dist,
                                     sweep_axis=int(axis))
    lo, hi = pipe.vol.bbox.lo, pipe.vol.bbox.hi

    def run(v, w, T, ds):
        return runner(v, w, T, ds, firsts, lo, hi)

    return run, (pipe.vol.val, pipe.vol.weight, pipe.T_wl, depths)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    run, args = build_run()
    run_and_trace(run, args, iters=2)
    report(top=int(sys.argv[1]) if len(sys.argv) > 1 else 40, iters=2)
