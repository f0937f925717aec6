"""Feature detection example: FAST segment test, Harris, NMS.

Offline equivalent of applications/examples/Features.cpp.
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
    ap.add_argument("--threshold", type=int, default=20)
    ap.add_argument("--min-segment", type=int, default=9)
    ap.add_argument("--nms-rad", type=int, default=2)
    ap.add_argument("--harris-thresh", type=float, default=1e4)
    args = ap.parse_args()

    from kangaroo_tpu.ops import features

    out = _common.out_dir()
    img = _common.test_image(320, 240).astype(np.uint8)
    imgj = jnp.asarray(img)

    seg = features.segment_test(imgj, args.threshold, args.min_segment)
    _common.save_png(f"{out}/fast.png", seg)

    score = features.harris_score(imgj)
    nms = features.non_maximal_suppression(score, args.nms_rad, args.harris_thresh)
    _common.save_png(f"{out}/harris_nms.png", nms)

    corners = features.get_indices(nms, 128)
    print(f"{len(corners)} Harris corners after NMS; wrote fast.png, harris_nms.png to {out}/")


if __name__ == "__main__":
    main()
