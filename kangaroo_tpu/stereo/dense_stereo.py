"""Scanline patch-match dense stereo (no cost volume).

TPU-native equivalent of DenseStereo (src/cu_dense_stereo.cu:209-405): per
pixel, WTA over patch scores along the scanline with a second-best acceptance
test, plus DenseStereoSubpixelRefine (:580-627), the 3-rescore parabola.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.patch_score import score_shifted

MIN_DISPARITY = 0  # cu_dense_stereo.cu MinDisparity


@functools.partial(jax.jit, static_argnames=("max_disp", "rad", "kind"))
def dense_stereo(left, right, max_disp: int, rad: int = 1, kind: str = "sand",
                 accept_thresh=0.0):
    """WTA patch-match disparity with second-best test (DenseStereo,
    cu_dense_stereo.cu:209-260).

    For each left pixel, searches d in [0, max_disp] of Score(left(x),
    right(x-d)); if the best and second-best disparities differ by more than
    1 and their relative score gap (snd-best)/best is below accept_thresh,
    the pixel is invalidated (-1). Border pixels (within the patch width) are
    invalid as in the reference.
    """
    H, W = left.shape
    best_s = jnp.full((H, W), 1e36, jnp.float32)
    best_d = jnp.full((H, W), -1, jnp.int32)
    snd_s = jnp.full((H, W), 1e37, jnp.float32)
    snd_d = jnp.full((H, W), -1, jnp.int32)
    x = jnp.arange(W)[None, :]
    width = 2 * rad + 1
    for d in range(max_disp + 1):
        score = score_shifted(left, right, -d, rad, kind)
        ok = d <= x + width  # reference: maxDisp = min(maxDispVal, x + width)
        better = ok & (score < best_s)
        second = ok & ~better & (score <= snd_s)
        snd_s = jnp.where(better, best_s, jnp.where(second, score, snd_s))
        snd_d = jnp.where(better, best_d, jnp.where(second, d, snd_d))
        best_s = jnp.where(better, score, best_s)
        best_d = jnp.where(better, d, best_d)

    cd = (snd_s - best_s) / best_s
    reject = (jnp.abs(best_d - snd_d) > 1) & (cd < accept_thresh)
    out = jnp.where(reject, -1, best_d)
    y = jnp.arange(H)[:, None]
    interior = (x >= width) & (x < W - width) & (y >= width) & (y < H - width)
    return jnp.where(interior, out, -1)


@functools.partial(jax.jit, static_argnames=("rad", "kind"))
def dense_stereo_subpixel_refine(disp, left, right, rad: int = 1,
                                 kind: str = "sand"):
    """Parabola refinement by re-scoring at d-1, d, d+1
    (DenseStereoSubpixelRefine, cu_dense_stereo.cu:580-627). NaN where the
    fit is not sensible or disp < MinDisparity."""
    H, W = disp.shape
    disp_i = disp.astype(jnp.int32)

    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    lp = jnp.pad(lf, rad, mode="edge")
    rp = jnp.pad(rf, ((rad, rad), (0, 0)), mode="edge")
    x_idx = jnp.arange(W)[None, :]

    def score_at(delta):
        """Patch score with the whole right patch shifted by the centre
        pixel's disparity, exactly like Score(left, x, y, right, x-d, y)."""
        acc = jnp.zeros((H, W), jnp.float32)
        for dy in range(2 * rad + 1):
            for dx in range(-rad, rad + 1):
                l_val = jax.lax.dynamic_slice(lp, (dy, rad + dx), (H, W))
                xs = jnp.clip(x_idx + dx - (disp_i + delta), 0, W - 1)
                r_val = jnp.take_along_axis(
                    jax.lax.dynamic_slice(rp, (dy, 0), (H, W)), xs, axis=1
                )
                d = l_val - r_val
                acc = acc + (jnp.abs(d) if kind in ("sad", "sand") else d * d)
        return acc

    s1 = score_at(1)   # d+1
    s2 = score_at(0)   # d
    s3 = score_at(-1)  # d-1
    d1 = disp.astype(jnp.float32) + 1.0
    d2 = disp.astype(jnp.float32)
    d3 = disp.astype(jnp.float32) - 1.0
    denom = (d1 - d2) * (d1 - d3) * (d2 - d3)
    A = (d3 * (s2 - s1) + d2 * (s1 - s3) + d1 * (s3 - s2)) / denom
    B = (d3 * d3 * (s1 - s2) + d2 * d2 * (s3 - s1) + d1 * d1 * (s2 - s3)) / denom
    new_disp = -B / (2.0 * A)
    sensible = (new_disp > d3) & (new_disp < d1)
    valid = disp >= MIN_DISPARITY
    return jnp.where(sensible & valid, new_disp, jnp.nan)
