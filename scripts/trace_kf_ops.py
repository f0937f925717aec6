"""Op-level xplane trace of the one-jit KinectFusion frame on the real TPU.

Parses the /device:TPU:0 plane of a jax.profiler trace (the tunnel-safe
recipe from docs/PERF.md) and prints the top ops by total self time, with
the repo source line each op's metadata carries. Used to decide where the
<5 ms frame budget goes (VERDICT r3 #7).
"""
from __future__ import annotations

import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf
from kangaroo_tpu.apps import synthetic

LOGDIR = "/tmp/kf_trace"


def build_frame():
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
    step = pipe._step
    lo, hi = pipe.vol.bbox.lo, pipe.vol.bbox.hi

    def frame(v, w_, T, depth):
        return step(v, w_, T, depth, jnp.asarray(False), lo, hi)

    return frame, (pipe.vol.val, pipe.vol.weight, pipe.T_wl, d1)


def run_and_trace(fn, args, iters=6):
    f = jax.jit(fn)
    out = f(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync (tunnel-safe)
    import shutil

    shutil.rmtree(LOGDIR, ignore_errors=True)
    with jax.profiler.trace(LOGDIR):
        for _ in range(iters):
            out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def report(top=40, iters=6):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
    assert paths, "no xplane output found"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    plane = next(p for p in xs.planes if "/device:TPU:0" in p.name)
    ev_meta = plane.event_metadata
    st_meta = plane.stat_metadata
    tot = {}
    cnt = {}
    src = {}
    for line in plane.lines:
        for ev in line.events:
            md = ev_meta[ev.metadata_id]
            name = md.name
            tot[name] = tot.get(name, 0) + ev.duration_ps
            cnt[name] = cnt.get(name, 0) + 1
            if name not in src:
                for st in list(ev.stats) + list(md.stats):
                    sname = st_meta[st.metadata_id].name
                    if sname in ("source_info", "source", "tf_op"):
                        val = st.str_value or st_meta[st.ref_value].name
                        src[name] = val
    total_ms = sum(tot.values()) / 1e9
    print(f"total device time {total_ms:.2f} ms over {iters} iters "
          f"(~{total_ms / iters:.2f} ms/frame)")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    for name, ps in rows:
        ms = ps / 1e9
        print(f"{ms:8.3f} ms  x{cnt[name]:<3d} {name[:90]:90s} "
              f"{src.get(name, '')[:70]}")


if __name__ == "__main__":
    frame, args = build_frame()
    run_and_trace(frame, args)
    report(top=int(sys.argv[1]) if len(sys.argv) > 1 else 40)
