"""SdfDifference: load two saved TSDF volumes and visualise their difference.

Offline equivalent of applications/examples/SdfDifference.cpp (:1-120): the
reference loads save.vol/save2.vol, raycasts one (switch_sdf picks which)
and renders the other's SDF value sampled at the hit points (diff_sdf) as a
heat overlay. Here: raycast depth/normals of volume A, sample volume B at
the hit points (fusion.sdf.sdf_distance), write a heat-mapped PNG + stats.

Usage: python sdf_difference_demo.py volA.vol volB.vol [--switch] [--stats-only]
With no arguments, synthesises two offset spheres as a self-test.
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
    ap.add_argument("vols", nargs="*", help="two .vol PXM TSDF dumps")
    ap.add_argument("--switch", action="store_true",
                    help="raycast B and sample A (ui.switch_sdf)")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--focal", type=float, default=288.0)
    ap.add_argument("--stats-only", action="store_true")
    args = ap.parse_args()

    import kangaroo_tpu as kt
    from kangaroo_tpu.core import se3
    from kangaroo_tpu.fusion import raycast as rc
    from kangaroo_tpu.fusion import sdf as sdf_mod
    from kangaroo_tpu.io import pxm
    from kangaroo_tpu.ops import viz

    out = _common.out_dir()
    if len(args.vols) == 2:
        vol_a = pxm.load_tsdf(args.vols[0])
        vol_b = pxm.load_tsdf(args.vols[1])
    elif not args.vols:
        print("no volumes given; synthesising two offset spheres")
        bbox = kt.BoundingBox.create((-1.2,) * 3, (1.2,) * 3)
        base = kt.TsdfVolume.create(96, 96, 96, bbox, trunc_dist=0.15)
        vol_a = sdf_mod.sdf_sphere(base, (0.0, 0.0, 0.0), 0.8)
        vol_b = sdf_mod.sdf_sphere(base, (0.05, 0.0, 0.0), 0.8)
    else:
        ap.error("pass exactly two volumes (or none for the self-test)")

    if args.switch:
        vol_a, vol_b = vol_b, vol_a

    W, H = args.width, args.height
    K = kt.Intrinsics.centered(args.focal, W, H)
    T_wc = jnp.asarray(se3.make(np.eye(3), [0.0, 0.0, -3.0]))
    size = float(jnp.max(vol_a.bbox.size()))
    trunc = 2.0 * size / vol_a.val.shape[0]
    depth, norm, img = rc.raycast_sdf(vol_a, T_wc, K, W, H, near=0.1,
                                      far=3.0 + 2 * size, trunc_dist=trunc)

    # sample B's SDF at A's surface (SdfDistance, cu_sdffusion.cu:201-224)
    dist = sdf_mod.sdf_distance(depth, vol_b, T_wc, K)
    hit = np.isfinite(np.asarray(depth))
    d = np.asarray(dist)[hit]
    d = d[np.isfinite(d)]
    if d.size == 0:
        print("no overlapping surface between the two volumes")
        return
    print(f"surface pixels: {hit.sum()}  |sdf_B at surface_A|: "
          f"mean {np.abs(d).mean():.5f}  median {np.median(np.abs(d)):.5f}  "
          f"max {np.abs(d).max():.5f}  (volume units)")
    if args.stats_only:
        return

    # heat overlay like the reference's diff_sdf render
    span = float(np.percentile(np.abs(d), 95)) or 1e-6
    heat = viz.remap_heat(img, jnp.where(jnp.isfinite(dist), dist, 0.0),
                          -span, span)
    _common.save_png(f"{out}/sdf_diff.png", heat)
    _common.save_png(f"{out}/sdf_diff_shaded.png", img)
    print(f"wrote sdf_diff.png (heat span ±{span:.4f}) and "
          f"sdf_diff_shaded.png to {out}/")


if __name__ == "__main__":
    main()
