"""Filtering examples: Anaglyph, BilateralFilter, GuidedFilter.

Offline equivalents of applications/examples/{Anaglyph,BilateralFilter,
GuidedFilter}.cpp.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _common

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gs", type=float, default=2.0, help="bilateral spatial sigma")
    ap.add_argument("--gr", type=float, default=20.0, help="bilateral range sigma")
    ap.add_argument("--size", type=int, default=5, help="bilateral radius")
    ap.add_argument("--guided-rad", type=int, default=9)
    ap.add_argument("--guided-eps", type=float, default=1e-2)
    args = ap.parse_args()

    from kangaroo_tpu.apps import synthetic
    from kangaroo_tpu.ops import bilateral, integral_image, viz

    out = _common.out_dir()
    left, right, _ = synthetic.stereo_pair(320, 240, 32)

    ana = viz.make_anaglyph(left, right)
    _common.save_png(f"{out}/anaglyph.png", ana[..., :3])

    img = jnp.asarray(_common.test_image(320, 240))
    bi = bilateral.bilateral(img, args.gs, args.gr, args.size)
    _common.save_png(f"{out}/bilateral.png", bi)

    gf = integral_image.guided_filter(img / 255.0, img / 255.0,
                                      args.guided_rad, args.guided_eps)
    _common.save_png(f"{out}/guided.png", gf)
    print(f"wrote anaglyph.png, bilateral.png, guided.png to {out}/")


if __name__ == "__main__":
    main()
