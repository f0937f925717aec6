"""Pallas TPU kernel for winner-take-all disparity + subpixel refinement.

Single pass over the (D, H, W) cost volume: the XLA version
(costvolume.cost_vol_minimum_subpix) spends several HBM passes on argmin +
take_along_axis gathers; here each (D, R, W) block is reduced entirely in
VMEM — min, first-argmin, and the parabola neighbours via one-hot selects
over the disparity sublanes.

Matches costvolume.cost_vol_minimum_subpix exactly (same masking, tie, and
sensibility rules; cu_dense_stereo.cu:67-116).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
ROWS = 8


def _wta_kernel(vol_ref, out_ref, *, sd, D, W, subpix):
    # a bfloat16 volume streams at half the HBM bytes; arithmetic is f32
    # (census costs k/256 are bf16-exact, so results are bit-identical)
    blk = vol_ref[:].astype(jnp.float32)  # (D, R, W)
    R = blk.shape[1]
    d3 = jax.lax.broadcasted_iota(jnp.int32, (D, R, W), 0)
    x3 = jax.lax.broadcasted_iota(jnp.int32, (D, R, W), 2)
    xr3 = x3 + sd * d3
    ok = (xr3 >= 0) & (xr3 < W)
    v = jnp.where(ok, blk, _BIG)

    bestc = jnp.min(v, axis=0)  # (R, W)
    # first index attaining the min (argmin tie rule)
    bestd = jnp.min(jnp.where(v == bestc[None], d3, D), axis=0)

    out = bestd.astype(jnp.float32)
    if subpix:
        # neighbours at bestd +- 1 (volume read clamped to [0, D-1])
        dl = jnp.clip(bestd - 1, 0, D - 1)
        dr = jnp.clip(bestd + 1, 0, D - 1)
        sl = jnp.min(jnp.where(d3 == dl[None], blk, _BIG), axis=0)
        sr = jnp.min(jnp.where(d3 == dr[None], blk, _BIG), axis=0)
        bestraw = jnp.min(jnp.where(d3 == bestd[None], blk, _BIG), axis=0)
        denom = 2.0 * (sr - 2.0 * bestraw + sl)
        subp = bestd.astype(jnp.float32) - (sr - sl) / denom
        x2 = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        bestxr = x2 + sd * bestd
        interior = (bestxr > 0) & (bestxr < W - 1)
        sensible = (subp > bestd - 1) & (subp < bestd + 1)
        out = jnp.where(interior & sensible, subp, out)
    out_ref[:] = out


def _rows_for(vol):
    """Rows per block: bf16 arrays tile (16, 128) on TPU, so bf16 blocks
    take 16 rows (8-row blocks would read every 16-row tile twice)."""
    H = vol.shape[1]
    R = 2 * ROWS if vol.dtype == jnp.bfloat16 and H % (2 * ROWS) == 0 else ROWS
    assert H % R == 0
    return R


@functools.partial(jax.jit, static_argnames=("sd", "subpix"))
def cost_vol_minimum_subpix(vol, sd: int = -1, subpix: bool = True):
    """Drop-in Pallas replacement for costvolume.cost_vol_minimum_subpix."""
    D, H, W = vol.shape
    R = _rows_for(vol)
    return pl.pallas_call(
        functools.partial(_wta_kernel, sd=sd, D=D, W=W, subpix=subpix),
        grid=(H // R,),
        in_specs=[pl.BlockSpec((D, R, W), lambda g: (0, g, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(vol if vol.dtype == jnp.bfloat16 else vol.astype(jnp.float32))


def _wta_sq_kernel(vol_ref, last_ref, scal_ref, out_ref, *, sd, D, W):
    # bf16 volumes upcast per block (see _wta_kernel) — the DTAM loop calls
    # this once per iteration, so halving the streamed bytes halves the
    # dominant HBM cost of the whole alternation
    blk = vol_ref[:].astype(jnp.float32)  # (D, R, W)
    R = blk.shape[1]
    lastd = last_ref[:]  # (R, W)
    lam = scal_ref[0]
    inv2theta = scal_ref[1]
    d3 = jax.lax.broadcasted_iota(jnp.int32, (D, R, W), 0)
    x3 = jax.lax.broadcasted_iota(jnp.int32, (D, R, W), 2)
    xr3 = x3 + sd * d3
    ok = (xr3 >= 0) & (xr3 < W)
    dd = lastd[None] - d3.astype(jnp.float32)
    cost = inv2theta * dd * dd + lam * blk
    v = jnp.where(ok, cost, _BIG)

    bestc = jnp.min(v, axis=0)
    bestd = jnp.min(jnp.where(v == bestc[None], d3, D), axis=0)

    dlf = bestd.astype(jnp.float32) - 1.0
    drf = bestd.astype(jnp.float32) + 1.0
    dl = jnp.clip(bestd - 1, 0, D - 1)
    dr = jnp.clip(bestd + 1, 0, D - 1)
    vl = jnp.min(jnp.where(d3 == dl[None], blk, _BIG), axis=0)
    vr = jnp.min(jnp.where(d3 == dr[None], blk, _BIG), axis=0)
    cl = inv2theta * (lastd - dlf) ** 2 + lam * vl
    cr = inv2theta * (lastd - drf) ** 2 + lam * vr
    subp = bestd.astype(jnp.float32) - (cr - cl) / (2.0 * (cr - 2.0 * bestc + cl))
    x2 = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    bestxr = x2 + sd * bestd
    interior = (bestxr > 0) & (bestxr < W - 1)
    sensible = (subp > dlf) & (subp < drf)
    out_ref[:] = jnp.where(interior & sensible, subp, bestd.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("sd",))
def cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd: int = -1):
    """Pallas version of the DTAM auxiliary exhaustive search
    (costvolume.cost_vol_minimum_square_penalty_subpix)."""
    D, H, W = vol.shape
    R = _rows_for(vol)
    scal = jnp.stack(
        [jnp.asarray(lam, jnp.float32), 1.0 / (2.0 * jnp.asarray(theta, jnp.float32))]
    )
    kern = functools.partial(_wta_sq_kernel, sd=sd, D=D, W=W)
    return pl.pallas_call(
        kern,
        grid=(H // R,),
        in_specs=[
            pl.BlockSpec((D, R, W), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(vol if vol.dtype == jnp.bfloat16 else vol.astype(jnp.float32),
      last_disp.astype(jnp.float32), scal)
