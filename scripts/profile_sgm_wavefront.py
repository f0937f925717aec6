"""Measure the sharded-SGM wavefront's seam/fill overheads on ONE chip and
print the N-chip scaling model's inputs (docs/PERF.md "wavefront overhead
model").

The wavefront strategy (parallel/sharding.py sharded_semi_global_matching)
runs vertical scans as a column-block pipeline: shard k processes block
(t - k) at step t, passing only that block's carry downstream, so both
directions finish in 2n-1 block-steps. One chip cannot measure ICI, but it
CAN measure every term of the cost model:

  T_wave(n) ~= T_h / n                      (horizontal pair, row-local)
             + (2n - 1) * T_blk(H/n, W/n)   (pipelined vertical pair)
             + (2n - 1) * c_step            (per-step overhead: carry
                                             ppermute + dispatch + slices)

  T_blk(h, w): one vertical-pair scan over an (D, h, w) block with carry
  in/out (sgm_aggregate_block x2 directions);
  seam overhead:   running H as n chained H/n blocks vs one whole scan;
  c_step floor:    the block kernel's launch floor at tiny shapes.

Usage: python scripts/profile_sgm_wavefront.py [--n 8]
"""
from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="model shard count")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax.numpy as jnp

    from kangaroo_tpu.stereo import sgm_pallas as sp
    from kangaroo_tpu.utils.timing import time_fn

    D, H, W = 64, 480, 640
    n = args.n
    Hs, Wc = H // n, W // n
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))

    def ms(f, *a, iters=args.iters, **kw):
        return 1e3 * time_fn(f, *a, iters=iters, **kw)

    # whole-image vertical scan pair (the unsharded baseline for T_v)
    t_v = ms(lambda v, i: sp.sgm_aggregate_scan(v, i, 0.01, 0.02, True,
                                                "left", scan_is_x=False),
             vol, img)
    # forward-only whole vertical scan: the like-for-like baseline for the
    # one-direction chained-blocks seam measurement below
    # reduce_outputs here matches the chained measurement below so the
    # full-output sum overhead cancels out of the seam estimate
    t_v1 = ms(lambda v, i: sp.sgm_aggregate_scan(v, i, 0.01, 0.02, False,
                                                 "left", scan_is_x=False),
              vol, img, iters=30, reduce_outputs=True)
    # whole-image horizontal pair (pre-transposed operands; the transposes
    # are XLA relayouts measured separately by the full pipeline bench)
    vt = jnp.swapaxes(vol, 1, 2)
    it = jnp.swapaxes(img, 0, 1)
    t_h = ms(lambda v, i: sp.sgm_aggregate_scan(v, i, 0.01, 0.02, True,
                                                "left", scan_is_x=True,
                                                width=W),
             vt, it)

    # one (D, Hs, W) block with carry in/out, forward direction only —
    # the wavefront's per-shard segment at full width (nb=1 pipelining)
    vol_b = vol[:, :Hs]
    img_b = img[:Hs]
    cp = jnp.full((D, W), 1e30, jnp.float32)
    cb = jnp.zeros((W,), jnp.float32)
    li = jnp.zeros((W,), jnp.float32)

    def blk(v, i, cp, cb, li):
        return sp.sgm_aggregate_block(v, i, 0.01, 0.02, "left", width=W,
                                      seed=False, carry_prev=cp,
                                      carry_best=cb, last_img=li)

    # sub-0.1 ms ops: the slope method needs hundreds of repetitions or it
    # reports 0.0 (see utils/timing.py and the census+WTA gotcha); the block
    # returns 4 leaves whose carries don't consume the lr volume — sum the
    # full outputs so nothing is DCE'd inside the repeat loop
    t_blk_fullw = ms(blk, vol_b, img_b, cp, cb, li, iters=400,
                     reduce_outputs=True)

    # the same block at the pipeline's column-block width Wc
    vol_bc = vol[:, :Hs, :Wc]
    img_bc = img[:Hs, :Wc]
    cpc, cbc, lic = cp[:, :Wc], cb[:Wc], li[:Wc]

    def blkc(v, i, cp, cb, li):
        return sp.sgm_aggregate_block(v, i, 0.01, 0.02, "left", width=W,
                                      seed=False, carry_prev=cp,
                                      carry_best=cb, last_img=li)

    t_blk_colw = ms(blkc, vol_bc, img_bc, cpc, cbc, lic, iters=800,
                    reduce_outputs=True)

    # n chained full-width blocks vs one whole scan -> per-seam overhead
    def chained(v, i):
        out = []
        c = (jnp.full((D, W), 1e30, jnp.float32), jnp.zeros((W,)),
             jnp.zeros((W,)))
        for k in range(n):
            blk_v = jax.lax.dynamic_slice(v, (0, k * Hs, 0), (D, Hs, W))
            blk_i = jax.lax.dynamic_slice(i, (k * Hs, 0), (Hs, W))
            lr, a, b, cmix = sp.sgm_aggregate_block(
                blk_v, blk_i, 0.01, 0.02, "left", width=W,
                seed=(k == 0), carry_prev=c[0], carry_best=c[1],
                last_img=c[2])
            c = (a, b, cmix)
            out.append(lr)
        return jnp.concatenate(out, axis=1)

    import jax

    # the concatenated output's first scalar depends only on block 0's lr
    # (later blocks feed it nothing) — reduce_outputs keeps all n blocks
    # live inside the repeat loop (the CLAUDE.md DCE trap)
    t_chained = ms(chained, vol, img, iters=30, reduce_outputs=True)

    # chained runs ONE direction; compare against the forward-only whole
    # scan, not the two-direction pair
    seam = (t_chained - t_v1) / n
    # fill/bubble model at n shards
    steps = 2 * n - 1
    t_wave_model = t_h / n + steps * t_blk_colw + steps * max(seam, 0.0)
    t_local = (t_v + t_h) / n

    print(f"T_v  whole vertical pair:        {t_v:8.3f} ms")
    print(f"T_v1 whole vertical fwd-only:    {t_v1:8.3f} ms")
    print(f"T_h  whole horizontal pair:      {t_h:8.3f} ms")
    print(f"T_blk (D,{Hs},{W}) + carry:      {t_blk_fullw:8.3f} ms")
    print(f"T_blk (D,{Hs},{Wc}) + carry:     {t_blk_colw:8.3f} ms")
    print(f"n chained fwd blocks vs fwd whole: {t_chained:8.3f} ms "
          f"(seam overhead {seam:+.4f} ms/segment)")
    print(f"--- model at n={n} (compute terms only; ICI latency excluded)")
    print(f"pipelined vertical fill: {steps} steps x {t_blk_colw:.3f} ms "
          f"= {steps * t_blk_colw:.3f} ms")
    print(f"T_wave({n}) ~= {t_wave_model:.3f} ms vs per-chip local share "
          f"{t_local:.3f} ms -> bubble factor "
          f"{t_wave_model / max(t_local, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
