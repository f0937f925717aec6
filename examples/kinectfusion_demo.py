"""KinectFusion end-to-end on a synthetic orbit sequence: tracking + fusion +
render + mesh export.

Offline equivalent of applications/kinectfusion/main.cpp.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _common

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--volres", type=int, default=96)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--input", type=str, default=None,
                    help="directory of PGM depth frames (millimetres, sorted "
                         "by name) streamed via the native frame loader; "
                         "default: synthetic orbit sequence")
    ap.add_argument("--depth-scale", type=float, default=1e-3,
                    help="raw depth -> metres (1/1000 for Kinect mm files)")
    ap.add_argument("--sequence", action="store_true",
                    help="replay the synthetic sequence in ONE device "
                         "dispatch (lax.scan of the frame step) instead of "
                         "the per-frame host loop")
    ap.add_argument("--colour", action="store_true",
                    help="fuse a colour volume in the same jit as tracking "
                         "(synthetic shaded-grey frames) and render from it")
    args = ap.parse_args()
    if args.colour and args.input:
        ap.error("--colour requires the synthetic sequence (the PGM input "
                 "path carries no rgb stream)")

    import kangaroo_tpu as kt
    from kangaroo_tpu.apps import kinectfusion as kf
    from kangaroo_tpu.apps import synthetic

    out = _common.out_dir()
    K = kt.Intrinsics.centered(args.width * 0.9, args.width, args.height)
    cfg = kf.KinectFusionConfig(
        w=args.width, h=args.height, vol_res=args.volres, vol_extent=1.2,
        max_levels=args.levels, its=(2,) * args.levels, near=0.5, far=6.0,
        max_rmse=0.3, front_volume=bool(args.input),
        use_colour=args.colour, rgb_focal=args.width * 0.9,
        rgb_baseline_m=0.0,
    )
    pipe = kf.KinectFusion(K, cfg)

    def shaded_rgb(depth):
        # synthetic colour: depth-shaded grey (nearer = brighter)
        g = jnp.clip(255.0 * (1.0 - (depth - 2.0) / 2.0), 0.0, 255.0)
        g = jnp.where(jnp.isfinite(depth) & (depth > 0), g, 0.0)
        return jnp.stack([g, g, g], axis=-1)

    errs = [0.0]
    if args.input:
        import glob

        from kangaroo_tpu.io.frame_loader import FrameLoader

        paths = sorted(glob.glob(os.path.join(args.input, "*.pgm")))[: args.frames]
        cfg.depth_scale = args.depth_scale
        for i, raw in FrameLoader(paths, n_threads=1):
            pipe.process_frame(jnp.asarray(raw))
            print(f"frame {i}: rmse {pipe.rmse:.4f} "
                  f"tracking_good={pipe.tracking_good}")
    else:
        scene = synthetic.sphere_scene(res=128)
        frames = list(synthetic.depth_sequence(
            args.frames, K, args.width, args.height, scene=scene, step=0.02))
        pipe.T_wl = frames[0][0]
        if args.sequence:
            depths = jnp.stack([jnp.where(jnp.isfinite(d), d, 0.0)
                                for _, d in frames])
            rgbs = (jnp.stack([shaded_rgb(d) for d in depths])
                    if args.colour else None)
            poses, rmses = pipe.run_sequence(depths, rgbs=rgbs)
            for i, (T_wc, _) in enumerate(frames):
                err = float(jnp.abs(poses[i] - T_wc).max())
                errs.append(err)
                rmse = float(rmses[i]) if i > 0 else 0.0  # frame 0: no model
                print(f"frame {i}: rmse {rmse:.4f} "
                      f"pose err {err:.4f}  (one-dispatch scan replay)")
        else:
            for i, (T_wc, depth) in enumerate(frames):
                depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
                est = pipe.process_frame(
                    depth, rgb=shaded_rgb(depth) if args.colour else None)
                err = float(jnp.abs(est - T_wc).max())
                errs.append(err)
                print(f"frame {i}: rmse {pipe.rmse:.4f} "
                      f"tracking_good={pipe.tracking_good} "
                      f"pose err {err:.4f}")

    d, n, img = pipe.render(show_colour=args.colour)
    _common.save_png(f"{out}/kf_render.png", img)
    _common.save_png(f"{out}/kf_depth.png", jnp.where(jnp.isfinite(d), d, 0.0))
    tris = pipe.save_mesh(f"{out}/kf_mesh.ply")
    pipe.save_volume(f"{out}/kf_save.vol")
    print(f"final pose drift {errs[-1]:.4f}; mesh {len(tris)} tris; "
          f"wrote kf_render.png, kf_depth.png, kf_mesh.ply, kf_save.vol to {out}/")


if __name__ == "__main__":
    main()
