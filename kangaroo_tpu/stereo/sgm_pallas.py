"""Pallas TPU kernels for SGM path aggregation.

The XLA ``lax.scan`` version (sgm.py) pays per-step dispatch overhead on its
~480 tiny steps; this kernel streams the cost volume through VMEM with the
recurrence carry resident on-chip.

Layout: the cost volume stays in its native (D, H, W) order, so each scan
step works on (D, W) tiles — disparity on sublanes (the recurrence's +-1
shifts are sublane rolls) and image x on the 128 lanes (full VPU width, and
the adaptive P2 broadcast is a natural lane vector). One kernel pass covers
the forward AND reverse direction of the scan axis (rows r and H-1-r per
block), with ``ROWS_PER_STEP`` rows per grid step so block DMAs pipeline
against compute. Horizontal paths run the same kernel on a (D, W, H)
transpose.

Semantics identical to sgm._scan_direction (and the golden NumPy model):
  CM = min(prev, prev<<1 + P1, prev>>1 + P1, lastBest + P2/(1+|dI|))
  Lr = CM + C - lastBest, with per-pixel disparity masking d <= x (sd=-1)
  or x + d < W (sd=+1); path starts contribute C directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
ROWS_PER_STEP = 8


def _make_kernel(P1, R, total, width, mask_mode, scan_is_x):
    """Kernel factory. Blocks are (D, R, N): disparity x rows x line-axis.
    ``scan_is_x``: the scan axis is the image x axis (volume pre-transposed
    to (D, W, H)), so the valid-disparity set moves with the scan position
    and ``width`` is the total scan length; otherwise the mask is static in
    the (d, x) plane and ``width`` is N."""

    def kernel(vol_f_ref, vol_r_ref, p2f_ref, p2r_ref, out_f_ref, out_r_ref,
               prev_f, best_f, prev_r, best_r):
        g = pl.program_id(0)
        D, N = prev_f.shape
        dsub = jax.lax.broadcasted_iota(jnp.int32, (D, N), 0)

        if scan_is_x:
            static_mask = None
        else:
            x = jax.lax.broadcasted_iota(jnp.int32, (D, N), 1)
            static_mask = (dsub <= x) if mask_mode == "left" else (x + dsub < width)

        def pos_mask(xpos):
            if not scan_is_x:
                return static_mask
            if mask_mode == "left":
                return dsub <= xpos
            return xpos + dsub < width

        def seed(c, out_ref, i, prev, best, m):
            c = c.astype(jnp.float32)
            out_ref[:, i, :] = jnp.where(m, c, 0.0) if m is not None else c
            prev[:] = jnp.where(m, c, _BIG) if m is not None else c
            best[:] = jnp.zeros_like(best)

        def step(c, p2_ref, out_ref, i, prev, best, m):
            c = c.astype(jnp.float32)
            p2 = p2_ref[0, i, :].reshape(1, N)  # lane vector
            pv = prev[:]
            lastbest = best[0:1, :]
            down = jnp.where(dsub == 0, _BIG, pltpu.roll(pv, 1, axis=0))
            up = jnp.where(dsub == D - 1, _BIG, pltpu.roll(pv, D - 1, axis=0))
            cm = jnp.minimum(
                jnp.minimum(pv, jnp.minimum(down, up) + P1), lastbest + p2
            )
            cr = cm + c - lastbest
            if m is not None:
                cr = jnp.where(m, cr, _BIG)
                out_ref[:, i, :] = jnp.where(m, cr, 0.0)
            else:
                out_ref[:, i, :] = cr
            prev[:] = cr
            best[:] = jnp.broadcast_to(jnp.min(cr, axis=0, keepdims=True), best.shape)

        for i in range(R):
            ri = R - 1 - i  # reverse block is processed back to front
            fwd_pos = g * R + i
            rev_pos = total - 1 - fwd_pos
            c_f = vol_f_ref[:, i, :]
            c_r = vol_r_ref[:, ri, :]
            m_f = pos_mask(fwd_pos)
            m_r = pos_mask(rev_pos)
            if i == 0:
                @pl.when(g == 0)
                def _(c_f=c_f, c_r=c_r, m_f=m_f, m_r=m_r):
                    seed(c_f, out_f_ref, 0, prev_f, best_f, m_f)
                    seed(c_r, out_r_ref, R - 1, prev_r, best_r, m_r)

                @pl.when(g > 0)
                def _(c_f=c_f, c_r=c_r, m_f=m_f, m_r=m_r):
                    step(c_f, p2f_ref, out_f_ref, 0, prev_f, best_f, m_f)
                    step(c_r, p2r_ref, out_r_ref, R - 1, prev_r, best_r, m_r)
            else:
                step(c_f, p2f_ref, out_f_ref, i, prev_f, best_f, m_f)
                step(c_r, p2r_ref, out_r_ref, ri, prev_r, best_r, m_r)

    return kernel


def _p2_rows(img, P2, reverse: bool):
    """(1, S, N) adaptive P2: [0, j, :] holds P2/(1+|img[j-+1]-img[j]|)
    (path predecessor j-1 forward, j+1 reverse), lane-oriented like the
    (D, R, N) volume blocks."""
    S, N = img.shape
    f = img.astype(jnp.float32)
    shift = 1 if not reverse else -1
    diff = jnp.abs(jnp.roll(f, shift, axis=0) - f)
    return (P2 / (1.0 + diff))[None]


@functools.partial(
    jax.jit,
    static_argnames=("P1", "P2", "do_reverse", "mask_mode", "scan_is_x", "width"),
)
def sgm_aggregate_scan(vol, img, P1=0.01, P2=0.02, do_reverse: bool = True,
                       mask_mode: str = "left", scan_is_x: bool = False,
                       width: int | None = None):
    """Aggregate along axis 1 of vol (D, S, N), both path directions in one
    kernel pass; img is (S, N). Returns the summed (D, S, N) contribution."""
    D, S, N = vol.shape
    R = ROWS_PER_STEP
    assert S % R == 0, f"scan length {S} must be a multiple of {R}"
    if width is None:
        width = S if scan_is_x else N
    if vol.dtype != jnp.bfloat16:
        # bf16 volumes stream half the DMA bytes; the recurrence itself
        # always runs f32 (costs are cast at the VMEM read)
        vol = vol.astype(jnp.float32)
    p2f = _p2_rows(img, P2, reverse=False)
    p2r = _p2_rows(img, P2, reverse=True)

    n_blocks = S // R
    blk = lambda g: (0, g, 0)
    blk_rev = lambda g: (0, n_blocks - 1 - g, 0)

    kernel = _make_kernel(P1, R, S, width, mask_mode, scan_is_x)
    out_f, out_r = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((D, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, N), blk_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, N), blk_rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, N), blk_rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, S, N), jnp.float32),
            jax.ShapeDtypeStruct((D, S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(vol, vol, p2f, p2r)
    if do_reverse:
        return out_f + out_r
    return out_f


@functools.partial(
    jax.jit,
    static_argnames=("P1", "P2", "do_horiz", "do_vert", "do_reverse",
                     "do_diagonal", "sd"),
)
def semi_global_matching(vol, img, P1=0.01, P2=0.02, do_horiz: bool = True,
                         do_vert: bool = True, do_reverse: bool = True,
                         do_diagonal: bool = False, sd: int = -1):
    """Drop-in Pallas replacement for sgm.semi_global_matching: vol (D, H, W),
    img (H, W) -> aggregated (D, H, W); a bfloat16 vol streams at half the
    bandwidth (aggregation is f32 regardless)."""
    D, H, W = vol.shape
    v = vol if vol.dtype == jnp.bfloat16 else vol.astype(jnp.float32)
    mask_mode = "left" if sd < 0 else "right"
    out = jnp.zeros_like(v)
    if do_vert:
        out = out + sgm_aggregate_scan(v, img, P1, P2, do_reverse,
                                       mask_mode, scan_is_x=False)
    if do_horiz:
        vt = jnp.swapaxes(v, 1, 2)  # (D, W, H): scan along x
        it = jnp.swapaxes(img, 0, 1)
        agg = sgm_aggregate_scan(vt, it, P1, P2, do_reverse, mask_mode,
                                 scan_is_x=True, width=W)
        out = out + jnp.swapaxes(agg, 1, 2)
    if do_diagonal:
        out = out + sgm_aggregate_diag(v, img, P1, P2, mask_mode, dx=1)
        out = out + sgm_aggregate_diag(v, img, P1, P2, mask_mode, dx=-1)
    return out


def _make_diag_kernel(P1, R, total, width, mask_mode, dx):
    """Diagonal-path kernel: like _make_kernel but the carry shifts ``dx``
    lanes per scan step, so pixel (x, row) continues the path from
    (x - dx, row -+ 1). Lanes whose predecessor falls outside the image (and
    the whole first row) re-seed: Lr = C, lastBest = 0 — identical start
    semantics to the straight paths. Covers (dx, +1) in the forward stream
    and (dx, -1) in the reverse stream."""

    def kernel(vol_f_ref, vol_r_ref, p2f_ref, p2r_ref, out_f_ref, out_r_ref,
               prev_f, best_f, prev_r, best_r):
        g = pl.program_id(0)
        D, N = prev_f.shape
        dsub = jax.lax.broadcasted_iota(jnp.int32, (D, N), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (D, N), 1)
        x = jax.lax.broadcasted_iota(jnp.int32, (D, N), 1)
        static_mask = (dsub <= x) if mask_mode == "left" else (x + dsub < width)
        pred_in_image = (lane - dx >= 0) & (lane - dx < N)

        def step(c, p2_ref, out_ref, i, prev, best, row_pos):
            c = c.astype(jnp.float32)
            p2 = p2_ref[0, i, :].reshape(1, N)
            has_prev = (row_pos >= 1) & pred_in_image
            pv = jnp.where(has_prev, pltpu.roll(prev[:], dx % N, axis=1), _BIG)
            lastbest = jnp.where(
                has_prev[0:1, :], pltpu.roll(best[0:1, :], dx % N, axis=1), 0.0
            )
            down = jnp.where(dsub == 0, _BIG, pltpu.roll(pv, 1, axis=0))
            up = jnp.where(dsub == D - 1, _BIG, pltpu.roll(pv, D - 1, axis=0))
            cm = jnp.minimum(
                jnp.minimum(pv, jnp.minimum(down, up) + P1), lastbest + p2
            )
            cr_cont = cm + c - lastbest
            cr = jnp.where(has_prev, cr_cont, c)
            cr = jnp.where(static_mask, cr, _BIG)
            out_ref[:, i, :] = jnp.where(static_mask, cr, 0.0)
            prev[:] = cr
            newbest = jnp.where(
                has_prev[0:1, :], jnp.min(cr, axis=0, keepdims=True), 0.0
            )
            best[:] = jnp.broadcast_to(newbest, best.shape)

        for i in range(R):
            ri = R - 1 - i
            step(vol_f_ref[:, i, :], p2f_ref, out_f_ref, i, prev_f, best_f,
                 g * R + i)
            step(vol_r_ref[:, ri, :], p2r_ref, out_r_ref, ri, prev_r, best_r,
                 g * R + i)

    return kernel


def _p2_diag(img, P2, dx: int, reverse: bool):
    """(1, S, N) adaptive P2 for a diagonal path: row j, column x holds
    P2/(1+|img[j-+1, x-dx] - img[j, x]|)."""
    f = img.astype(jnp.float32)
    shift_r = 1 if not reverse else -1
    pred = jnp.roll(jnp.roll(f, shift_r, axis=0), dx, axis=1)
    return (P2 / (1.0 + jnp.abs(pred - f)))[None]


@functools.partial(
    jax.jit, static_argnames=("P1", "P2", "mask_mode", "dx", "width")
)
def sgm_aggregate_diag(vol, img, P1=0.01, P2=0.02, mask_mode: str = "left",
                       dx: int = 1, width: int | None = None):
    """Diagonal aggregation along axis 1 of vol (D, S, N): directions (dx, +1)
    and (dx, -1) in one kernel pass. Returns the summed contribution."""
    D, S, N = vol.shape
    R = ROWS_PER_STEP
    assert S % R == 0
    if width is None:
        width = N
    if vol.dtype != jnp.bfloat16:
        vol = vol.astype(jnp.float32)
    p2f = _p2_diag(img, P2, dx, reverse=False)
    p2r = _p2_diag(img, P2, dx, reverse=True)

    n_blocks = S // R
    blk = lambda g: (0, g, 0)
    blk_rev = lambda g: (0, n_blocks - 1 - g, 0)

    kernel = _make_diag_kernel(P1, R, S, width, mask_mode, dx)
    out_f, out_r = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((D, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, N), blk_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, N), blk_rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, R, N), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, R, N), blk_rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, S, N), jnp.float32),
            jax.ShapeDtypeStruct((D, S, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(vol, vol, p2f, p2r)
    return out_f + out_r
