"""Pallas TPU kernel for the plane-sweep TSDF fuse.

The XLA scan in fusion/separable.py materialises its per-plane-batch
interpolation slabs through HBM (~1.7 ms of DMA staging per 256^3 fuse,
visible as dynamic-update-slice/copy fusions in a device trace). This
kernel runs the plane loop as a Pallas grid with everything except the
volume itself VMEM-resident: per grid step it streams one (P, Hv, Wv)
batch of (val, weight) planes in and out, rebuilds the banded
interpolation matrices from iota, runs the two per-channel MXU matmuls
in-kernel, and applies the TSDF update elementwise — no intermediate HBM
traffic at all. The warped (md, ct) grid image is a kernel input with a
constant index map, so it is DMA'd once and stays in VMEM.

MEASURED RESULT (v5e, 256^3/VGA): 2.52 ms vs the XLA scan's 2.48 ms,
bit-identical outputs — the scan is already at the f32 matmul compute
floor and XLA's async copies hide the slab staging this kernel set out
to remove. Kept as an opt-in (KANGAROO_PALLAS_FUSE=1) floor-proof; the
first device-side Mosaic compile takes ~20 minutes (cached after).

Semantics mirror separable._sdf_fuse_axis plane-for-plane (same masks,
same -1e6 invalid-depth sentinel, same blend; cu_sdffusion.cu:16-61).
Traced geometry scalars arrive via one SMEM params vector (CLAUDE.md:
scalars via SMEM BlockSpec, not closure captures).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# params vector layout (f32): A row-major [0:9], g [9:12], s_lo, ds, t_lo,
# dt [12:16], trunc_dist, max_w, mincostheta [16:19], enable [19]
_NPARAMS = 20


def _make_fuse_kernel(P, Hv, Wv, grid_h, grid_w, Wi, Hi):
    def kernel(params_ref, gmd_ref, gct_ref, val_ref, wgt_ref,
               oval_ref, owgt_ref):
        g = pl.program_id(0)
        A00, A01, A02 = params_ref[0], params_ref[1], params_ref[2]
        A10, A11, A12 = params_ref[3], params_ref[4], params_ref[5]
        A20, A21, A22 = params_ref[6], params_ref[7], params_ref[8]
        g0, g1, g2 = params_ref[9], params_ref[10], params_ref[11]
        s_lo, ds = params_ref[12], params_ref[13]
        t_lo, dt = params_ref[14], params_ref[15]
        trunc_dist = params_ref[16]
        max_w = params_ref[17]
        mincostheta = params_ref[18]
        enable = params_ref[19]

        gmd = gmd_ref[:]  # (grid_h, grid_w)
        gct = gct_ref[:]

        # iota planes reused by every p (tpu.iota is integer-only)
        def fiota(shape, dim):
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
                jnp.float32)

        jrow_h = fiota((Hv, grid_h), 0)
        gcol_h = fiota((Hv, grid_h), 1)
        irow_w = fiota((Wv, grid_w), 0)
        gcol_w = fiota((Wv, grid_w), 1)
        srow = fiota((Hv, Wv), 1)  # i index
        trow = fiota((Hv, Wv), 0)  # j index

        def plane_body(p, _):
            k = (g * P + p).astype(jnp.float32)
            denom = 1.0 + k * g2
            plane_ok = jnp.abs(denom) > 1e-6
            dsafe = jnp.where(plane_ok, denom, 1.0)
            off_s = k * g0
            off_t = k * g1

            # lerp matrices from iota (rows: voxel index, cols: grid
            # index); sub-1e-6 weights snap to zero like separable._lerp_weight
            tj = ((jrow_h + off_t) / dsafe - t_lo) / dt       # (Hv, gh)
            Rk = jnp.maximum(0.0, 1.0 - jnp.abs(tj - gcol_h))
            Rk = jnp.where(Rk > 1e-6, Rk, 0.0)
            si = ((irow_w + off_s) / dsafe - s_lo) / ds       # (Wv, gw)
            Ck = jnp.maximum(0.0, 1.0 - jnp.abs(si - gcol_w))
            Ck = jnp.where(Ck > 1e-6, Ck, 0.0)

            # pass 1 contracts grid_h, pass 2 contracts grid_w — MXU dots
            tmp_md = jax.lax.dot_general(
                Rk, gmd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Hv, gw)
            tmp_ct = jax.lax.dot_general(
                Rk, gct, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            md = jax.lax.dot_general(
                tmp_md, Ck, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Hv, Wv)
            ct = jax.lax.dot_general(
                tmp_ct, Ck, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            # analytic window mask (separable._sdf_fuse_axis win_ok)
            s_of_i = (srow + off_s) / dsafe                    # (Hv, Wv)
            t_of_j = (trow + off_t) / dsafe
            si_g = (s_of_i - s_lo) / ds
            tj_g = (t_of_j - t_lo) / dt
            win_ok = ((tj_g >= 0.0) & (tj_g <= grid_h - 1.0)
                      & (si_g >= 0.0) & (si_g <= grid_w - 1.0))

            # voxel camera depth + projection (in_img test)
            den_uv = A20 * s_of_i + A21 * t_of_j + A22
            qz = dsafe * den_uv
            den_safe = jnp.where(jnp.abs(den_uv) < 1e-12, jnp.nan, den_uv)
            uu = (A00 * s_of_i + A01 * t_of_j + A02) / den_safe
            vv = (A10 * s_of_i + A11 * t_of_j + A12) / den_safe
            # sampling.in_bounds(depth, u, v, border=2)
            in_img = ((uu >= 2.0) & (uu < Wi - 2.0)
                      & (vv >= 2.0) & (vv < Hi - 2.0))

            sd = ct * (md - qz)
            w = ct / qz
            update = (plane_ok & in_img & win_ok
                      & (sd > -trunc_dist)
                      & jnp.isfinite(md) & jnp.isfinite(w)
                      & (ct > mincostheta)
                      & (enable > 0.5))

            new_sd = jnp.where(update,
                               jnp.clip(sd, -trunc_dist, trunc_dist), 0.0)
            w_new = jnp.where(update, w, 0.0)
            old_val = val_ref[p]
            old_w = wgt_ref[p]
            old_val_safe = jnp.where(old_w > 0, old_val, 0.0)
            w_tot = old_w + w_new
            val = jnp.where(
                w_tot > 0,
                (old_w * old_val_safe + w_new * new_sd)
                / jnp.maximum(w_tot, 1e-20),
                old_val,
            )
            val = jnp.where(w_new > 0, val, old_val)
            oval_ref[p] = val
            owgt_ref[p] = jnp.minimum(w_tot, max_w)
            return 0

        jax.lax.fori_loop(0, P, plane_body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("P", "Wi", "Hi"))
def fuse_planes_pallas(val_p, wgt_p, gmd, gct, params, P: int,
                       Wi: int, Hi: int):
    """Run the plane loop of the separable fuse on TPU.

    val_p/wgt_p: (D, Hv, Wv) volume in sweep layout; gmd/gct: (gh, gw)
    warped depth (with -1e6 invalid sentinel) and costheta grids; params:
    (20,) f32 — see the layout at the top of this module (geometry, fuse
    constants and the enable gate are all traced, so they ride in SMEM).
    """
    D, Hv, Wv = val_p.shape
    grid_h, grid_w = gmd.shape
    kernel = _make_fuse_kernel(P, Hv, Wv, grid_h, grid_w, Wi, Hi)
    grid = (D // P,)
    blk_vol = pl.BlockSpec((P, Hv, Wv), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_grid = pl.BlockSpec((grid_h, grid_w), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk_grid,
            blk_grid,
            blk_vol,
            blk_vol,
        ],
        out_specs=[blk_vol, blk_vol],
        out_shape=[
            jax.ShapeDtypeStruct((D, Hv, Wv), jnp.float32),
            jax.ShapeDtypeStruct((D, Hv, Wv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(params, gmd, gct, val_p, wgt_p)
