"""Per-stage timing of the SGM stereo frame on the real TPU.

Breaks sgm_pipeline into its stages (census, volume build, the four Pallas
aggregation kernels, the f32 output adds + horizontal transpose relayouts,
WTA subpix, median, LR check) with utils.timing.time_fn, to steer the
directions-in-kernel / relayout work (VERDICT r2 next-steps #3).
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.apps import stereo_sgm, synthetic
from kangaroo_tpu.stereo import census as census_mod
from kangaroo_tpu.stereo import costvolume as cv
from kangaroo_tpu.stereo import dispatch as fast
from kangaroo_tpu.stereo import sgm_pallas as sp
from kangaroo_tpu.utils.timing import time_fn

W, H, D = 640, 480, 64
cfg = stereo_sgm.SgmConfig(max_disp=D, census_window="16x16")
left, right, gt = synthetic.stereo_pair(W, H, D, seed=0)
bits = census_mod.norm_bits(cfg.census_window)

cl = jax.jit(lambda x: census_mod.census(x, "16x16"))(left)
cr = jax.jit(lambda x: census_mod.census(x, "16x16"))(right)
vol_l = census_mod.census_cost_volume(cl, cr, D, -1, bits, dtype=jnp.bfloat16)
vol_r = census_mod.census_cost_volume(cr, cl, D, 1, bits, dtype=jnp.bfloat16)
img_l = left.astype(jnp.float32)
img_r = right.astype(jnp.float32)


def report(name, fn, *args, iters=30):
    ms = 1e3 * time_fn(jax.jit(fn), *args, iters=iters)
    print(f"{name:46s} {ms:8.3f} ms")
    return ms


report("census both", lambda l, r: (census_mod.census(l, "16x16"),
                                    census_mod.census(r, "16x16")), left, right)
report("cost volume L (bf16)", lambda a, b: census_mod.census_cost_volume(
    a, b, D, -1, bits, dtype=jnp.bfloat16), cl, cr)

# the four kernels in isolation (vert + horiz per volume)
report("vert kernel L (f+r summed)", lambda v, i: sp.sgm_aggregate_scan(
    v, i, 0.01, 0.02, True, "left", scan_is_x=False), vol_l, img_l)


def horiz(v, i):
    vt = jnp.swapaxes(v, 1, 2)
    it = jnp.swapaxes(i, 0, 1)
    agg = sp.sgm_aggregate_scan(vt, it, 0.01, 0.02, True, "left",
                                scan_is_x=True, width=W)
    return jnp.swapaxes(agg, 1, 2)


report("horiz kernel L (transposes + f+r)", horiz, vol_l, img_l)
report("full 4-path aggregate L", lambda v, i: sp.semi_global_matching(
    v, i, 0.01, 0.02), vol_l, img_l)

agg_l = sp.semi_global_matching(vol_l, img_l, 0.01, 0.02)
agg_r = sp.semi_global_matching(vol_r, img_r, 0.01, 0.02, sd=1)
report("WTA subpix L", lambda a: fast.cost_vol_minimum_subpix(a, -1), agg_l)
disp_l = fast.cost_vol_minimum_subpix(agg_l, -1)
disp_r = fast.cost_vol_minimum_subpix(agg_r, 1)
report("median reject x2", lambda a, b: (
    fast.median_filter_reject_invalid(a, 12, rad=2),
    fast.median_filter_reject_invalid(b, 12, rad=2)), disp_l, disp_r)
report("LR check both", lambda a, b: fast.left_right_check(
    fast.left_right_check(b, a, 1, 1.0, max_disp=D), a, -1, 1.0, max_disp=D),
    disp_l, disp_r)

report("FULL sgm_pipeline", lambda l, r: stereo_sgm.sgm_pipeline(l, r, cfg),
       left, right, iters=20)

# roll-based re-anchor of the left aggregation (lr_from_left without the
# take_along_axis gather) — the production helper
from kangaroo_tpu.stereo import costvolume as cv_mod

report("re-anchor aggL->aggR (rolls)", cv_mod.reanchor_right, agg_l)
