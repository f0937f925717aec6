"""Stereo pipelines end-to-end on a synthetic pair: SGM, DTAM-variational,
and raw WTA; exports disparity maps, depth and a point cloud.

Offline equivalent of applications/stereo/main.cpp and stereo2/main.cpp.
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
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--maxdisp", type=int, default=32)
    ap.add_argument("--mode", choices=["sgm", "dtam", "wta", "multiview"],
                    default="sgm")
    ap.add_argument("--baseline", type=float, default=0.1)
    ap.add_argument("--rig", type=str, default=None,
                    help="JSON camera-rig file (io/rig.py schema): intrinsics "
                         "and baseline come from it, like the reference's "
                         "-cmod camera models (stereo/main.cpp:103-110)")
    ap.add_argument("--heightmap", action="store_true",
                    help="run the full stereo2 app tail (Stereo2App): plane "
                         "fit + heightmap fusion + heightmap mesh export "
                         "(stereo2/main.cpp:503-536)")
    args = ap.parse_args()

    from kangaroo_tpu import Intrinsics
    from kangaroo_tpu.apps import stereo as stereo_app
    from kangaroo_tpu.apps import stereo_sgm, synthetic
    from kangaroo_tpu.fusion.marching_cubes import save_ply

    out = _common.out_dir()
    left, right, gt = synthetic.stereo_pair(args.width, args.height, args.maxdisp)
    _common.save_png(f"{out}/left.png", left)
    _common.save_png(f"{out}/gt_disp.png", gt)

    if args.mode == "sgm" and args.heightmap:
        # the full stereo2 app: SGM -> vbo -> PlaneFitGN -> HeightmapFusion
        K0 = Intrinsics.centered(args.width * 0.9, args.width, args.height)
        app = stereo_sgm.Stereo2App(
            K0, args.baseline,
            stereo_sgm.SgmConfig(max_disp=args.maxdisp, census_window="9x7"),
            hm_size=(4.0, 4.0), hm_cell=0.02, min_disp=1.0)
        disp, d3d = app(left, right, image=left)
        n = np.asarray(app.n_c)
        print(f"plane fit: n_c = {n}, plane depth on axis = {-1.0/n[2]:.3f} m")
        app.hm.save_mesh(f"{out}/heightmap_sgm.ply")
        counts = np.asarray(app.hm.hm[..., 1])
        print(f"heightmap: {int((counts > 0).sum())} fused cells "
              f"-> {out}/heightmap_sgm.ply")
    elif args.mode == "sgm":
        cfg = stereo_sgm.SgmConfig(max_disp=args.maxdisp, census_window="9x7")
        disp = stereo_sgm.sgm_pipeline(left, right, cfg)
    elif args.mode == "multiview":
        # the stereo2 COSTVOL_TIME loop: anchor a keyframe, CostVolumeAdd a
        # posed synthetic camera track, DTAM-solve the accumulated volume
        from kangaroo_tpu.core import se3

        key, gt, track = synthetic.multiview_track(
            args.width, args.height, args.maxdisp, baseline=args.baseline)
        K = Intrinsics.centered(args.width * 0.9, args.width, args.height)
        mvs = stereo_app.MultiViewStereo(
            K, args.baseline,
            stereo_app.StereoConfig(max_disp=args.maxdisp,
                                    census_window="9x7",
                                    dtam_iterations=50))
        mvs.reset(key.astype(jnp.float32), se3.identity())
        for img, T_wc in track:
            mvs.add(img.astype(jnp.float32), T_wc)
        print(f"multiview: accumulated {len(track)} posed views "
              f"(max n = {float(jnp.max(mvs.n)):.0f})")
        disp = mvs.solve(use_dtam=True)
        left = key
    else:
        cfg = stereo_app.StereoConfig(max_disp=args.maxdisp, census_window="9x7",
                                      dtam_iterations=50)
        disp = stereo_app.stereo_pipeline(left, right, cfg, use_dtam=args.mode == "dtam")

    g = np.asarray(gt)
    d = np.asarray(disp)
    m = np.isfinite(d)
    m[:, : args.maxdisp] = False
    err = np.abs(d[m] - g[m])
    print(f"{args.mode}: valid {m.mean():.2%}, median err {np.median(err):.3f} px, "
          f"<1px {np.mean(err < 1):.2%}")
    _common.save_png(f"{out}/disp_{args.mode}.png", jnp.where(jnp.isfinite(disp), disp, 0.0))

    if args.rig:
        from kangaroo_tpu.io import rig as rig_mod

        rig = rig_mod.load_rig(args.rig)
        cam = rig[rig.names()[0]].scaled_to(args.width, args.height)
        K = cam.intrinsics()
        args.baseline = rig.baseline()
        print(f"rig: fu={cam.fu:.1f} baseline={args.baseline:.4f} m")
    else:
        K = Intrinsics.centered(args.width * 0.9, args.width, args.height)
    depth, cloud = stereo_app.depth_and_cloud(disp, K, args.baseline, min_disp=1.0)
    _common.save_png(f"{out}/depth_{args.mode}.png", jnp.where(jnp.isfinite(depth), depth, 0.0))
    pts = np.asarray(cloud).reshape(-1, 4)
    pts = pts[np.isfinite(pts[:, 2]) & (pts[:, 3] > 0)][:, :3]
    save_ply(f"{out}/cloud_{args.mode}.ply", pts.reshape(-1, 1, 3).repeat(3, 1))
    print(f"wrote disparity/depth/point cloud to {out}/")


if __name__ == "__main__":
    main()
