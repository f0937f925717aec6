"""Pallas TPU kernel for the left-right consistency check.

The XLA version gathers disp_r at per-pixel float-derived columns — a lane
gather XLA lowers poorly. Here the gather becomes a bounded sweep over the
possible integer column offsets k = x - int(x + sd*dl) in [-1, max_disp):
each step is a lane roll plus a select, all in VMEM. Wrapped lanes are always
masked out by the in-bounds test. Matches costvolume.left_right_check
(LeftRightCheck, cu_dense_stereo.cu:512-546) exactly.

The check is purely row-local, so the kernel runs on row blocks (grid over
H // R): VMEM use and Mosaic program size stay bounded no matter how tall
the image is — stacked frame batches (apps.stereo_sgm.sgm_pipeline_batched
concatenates B frames along rows) reuse the same block program. A
whole-image (H, W) block instead made the compiler's live set scale with
H x the unrolled 65-offset sweep (the compile helper OOM-crashed at 960
rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(H: int) -> int:
    """Largest row-block size that divides H, is a lane-tiling multiple of 8
    and keeps the block small (<=128 rows); 0 if none (whole-image block)."""
    for r in range(min(H, 128), 0, -8):
        if r % 8 == 0 and H % r == 0:
            return r
    return 0


def _lr_kernel(dl_ref, dr_ref, out_ref, *, sd, max_disp, max_diff, W):
    dl = dl_ref[:]
    drm = dr_ref[:]
    H = dl.shape[0]
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    xr = x + sd * dl
    inb = (xr >= 0) & (xr < W)
    xi = jnp.clip(xr, 0, W - 1).astype(jnp.int32)  # truncation toward zero
    k_of_pixel = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) - xi
    gathered = jnp.full((H, W), jnp.nan, jnp.float32)
    ks = range(-1, max_disp) if sd < 0 else range(-max_disp, 2)
    for k in ks:
        cand = pltpu.roll(drm, k % W, axis=1)
        gathered = jnp.where(k_of_pixel == k, cand, gathered)
    ok = inb & jnp.isfinite(gathered) & (jnp.abs(dl - gathered) <= max_diff)
    out_ref[:] = jnp.where(ok, dl, jnp.nan)


@functools.partial(jax.jit, static_argnames=("sd", "max_disp", "max_diff"))
def left_right_check(disp_l, disp_r, sd: int = -1, max_diff: float = 1.0,
                     max_disp: int = 192):
    H, W = disp_l.shape
    R = _row_block(H)
    if R:
        grid = (H // R,)
        spec = pl.BlockSpec((R, W), lambda g: (g, 0), memory_space=pltpu.VMEM)
    else:
        grid = (1,)
        spec = pl.BlockSpec((H, W), lambda g: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _lr_kernel, sd=sd, max_disp=max_disp, max_diff=max_diff, W=W
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(disp_l.astype(jnp.float32), disp_r.astype(jnp.float32))
