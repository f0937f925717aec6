"""Standalone SDF raycast demo.

Offline equivalent of applications/examples/Raycast.cpp: a 128^3 analytic
sphere SDF (SdfSphere, radius 0.9 in a [-1, 1]^3 volume) raycast from an
orbiting camera at 512x512 with K = (500, 500, w/2, h/2) — the app's exact
working config (Raycast.cpp:19-22,59). Instead of the interactive Pangolin
view, each orbit pose writes the Phong-shaded render, the depth map and the
normal map as PNGs, for both the subpix setting's states (the app's
ui.subpix toggle, Raycast.cpp:61) and both raycast engines (the
reference-exact sphere-trace and the TPU plane-sweep).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _common

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512, help="render w=h")
    ap.add_argument("--res", type=int, default=128, help="volume resolution")
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--near", type=float, default=0.0)
    ap.add_argument("--far", type=float, default=10.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    import kangaroo_tpu as kt
    from kangaroo_tpu.apps import synthetic
    from kangaroo_tpu.fusion import raycast as rc
    from kangaroo_tpu.fusion import sdf as sdf_mod
    from kangaroo_tpu.fusion import separable as sep

    out = _common.out_dir()
    w = h = args.size
    K = kt.Intrinsics(500.0, 500.0, w / 2, h / 2)
    bbox = kt.BoundingBox.create((-1, -1, -1), (1, 1, 1))
    vol = kt.TsdfVolume.create(args.res, args.res, args.res, bbox,
                               trunc_dist=2.0 / args.res * 2)
    vol = sdf_mod.sdf_sphere(vol, (0.0, 0.0, 0.0), 0.9)

    for i, ang in enumerate(np.linspace(0, 2 * np.pi, args.views,
                                        endpoint=False)):
        T_wc = jnp.asarray(synthetic.orbit_pose(ang, radius=4.0))
        # the app's RaycastSdf with subpix on (the ui.subpix default)
        d, nrm, img = rc.raycast_sdf(vol, T_wc, K, w, h, near=args.near,
                                     far=args.far, subpix=True)
        _common.save_png(f"{out}/raycast_shaded_{i}.png",
                         jnp.where(jnp.isfinite(d), img, 0.0))
        _common.save_png(f"{out}/raycast_depth_{i}.png",
                         jnp.where(jnp.isfinite(d), d, 0.0))
        _common.save_png(f"{out}/raycast_normals_{i}.png",
                         jnp.where(jnp.isfinite(d)[..., None],
                                   0.5 * (nrm + 1.0), 0.0))
        # subpix off: snap to the voxel step like the toggle's other state
        d0, _, _ = rc.raycast_sdf(vol, T_wc, K, w, h, near=args.near,
                                  far=args.far, subpix=False)
        # the TPU-native plane-sweep engine renders the same scene
        ds, _, imgs = sep.raycast_sdf_separable(vol, T_wc, K, w, h,
                                                near=max(args.near, 0.5),
                                                far=args.far)
        _common.save_png(f"{out}/raycast_sweep_{i}.png",
                         jnp.where(jnp.isfinite(ds), imgs, 0.0))
        fin = np.isfinite(np.asarray(d))
        print(f"view {i}: hit fraction {fin.mean():.3f}, "
              f"depth range [{np.asarray(d)[fin].min():.3f}, "
              f"{np.asarray(d)[fin].max():.3f}] "
              f"(subpix-off mean |delta| "
              f"{np.nanmean(np.abs(np.asarray(d0) - np.asarray(d))):.4f})")
    print(f"wrote renders for {args.views} orbit views to {out}/")


if __name__ == "__main__":
    main()
