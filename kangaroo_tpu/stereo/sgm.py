"""Semi-global matching path aggregation.

TPU-native equivalent of src/cu_semi_global_matching.cu:21-89. The CUDA kernel
walks each path direction sequentially with one thread per column/row; here
each direction is a single ``lax.scan`` along the path axis with the
(line, disparity) plane vectorized on the VPU — the recurrence's shifted mins
are ``jnp.roll``s along the 128-lane disparity axis.

Recurrence per path step (cu_semi_global_matching.cu:40-62), with adaptive
P2' = P2 / (1 + |I(p) - I(p-r)|):

  CM(d)  = min( Lr(p-r, d),
                Lr(p-r, d-1) + P1,
                Lr(p-r, d+1) + P1,
                min_d' Lr(p-r, d') + P2' )
  Lr(p,d) = CM(d) + C(p,d) - min_d' Lr(p-r, d')

Per-pixel disparity clipping d < min(maxDisp, x+1) follows the reference; the
first pixel of each path contributes C(p,d) directly.

NOTE: the reference accumulates every direction into one ``volH`` buffer and
*reads its own partially-accumulated output* as the previous pixel's path cost
for the second and later directions (cu_semi_global_matching.cu:50-55) — the
directions are coupled through launch order. That coupling is an artifact of
in-place accumulation, not part of SGM (Hirschmüller 2008 sums independent
path costs); we implement the standard independent-path form, which equals the
reference when a single direction is enabled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAX_ERROR = jnp.float32(1e30)


def _shift_min(prev, P1):
    """min(prev[d], prev[d-1]+P1, prev[d+1]+P1) along the last axis, with
    out-of-range neighbours excluded."""
    left = jnp.roll(prev, 1, axis=-1).at[..., 0].set(_MAX_ERROR)
    right = jnp.roll(prev, -1, axis=-1).at[..., -1].set(_MAX_ERROR)
    return jnp.minimum(prev, jnp.minimum(left + P1, right + P1))


def _scan_direction(vol, img, dmask, P1, P2, reverse: bool, carry_in=None,
                    return_carry: bool = False):
    """Aggregate along axis 0 of vol (L, N, D); img is (L, N); dmask (L, N, D)
    marks lattice entries with d < min(maxDisp, x+1).

    Returns the per-direction path-cost volume Lr (L, N, D) with masked
    entries zero (the reference leaves them untouched at volH=0).

    ``carry_in`` continues a scan across a sharded axis (the multi-chip
    wavefront): a (prev_lr, last_best, last_c, prev_mask) tuple from the
    upstream shard; the first local row then steps from it instead of
    seeding. With ``return_carry`` the final carry is also returned.
    """
    if reverse:
        vol = vol[::-1]
        img = img[::-1]
        dmask = dmask[::-1]

    if carry_in is None:
        c0 = jnp.where(dmask[0], vol[0], 0.0)
        init = (
            jnp.where(dmask[0], c0, _MAX_ERROR),  # Lr at previous pixel
            jnp.zeros(img.shape[1:], vol.dtype),  # lastBestCr starts 0, see below
            img[0],  # last intensity
            dmask[0],
        )

    # Reference semantics: lastBestCr entering step r is min_d Cr(step r-1);
    # for the first step the path cost IS C(p,d) and lastBest = min over the
    # first pixel's written values... The CUDA kernel sets lastBestCr=0 before
    # the first step and does not update it from the seeded row (it only
    # updates inside the loop), so step 1 uses lastBestCr = 0 and
    # Lr(p0) = C(p0). We reproduce exactly that.
    def step(carry, inputs):
        prev_lr, last_best, last_c, prev_mask = carry
        c, cost, mask = inputs
        diff = last_c - c
        p2 = P2 / (1.0 + jnp.abs(diff))
        prev = jnp.where(prev_mask, prev_lr, _MAX_ERROR)
        cm = jnp.minimum(_shift_min(prev, P1), last_best[..., None] + p2[..., None])
        cr = cm + cost - last_best[..., None]
        cr = jnp.where(mask, cr, _MAX_ERROR)
        best = jnp.min(cr, axis=-1)
        out = jnp.where(mask, cr, 0.0)
        return (cr, best, c, mask), out

    if carry_in is None:
        final, lr = jax.lax.scan(step, init, (img[1:], vol[1:], dmask[1:]))
        lr = jnp.concatenate([c0[None], lr], axis=0)
    else:
        final, lr = jax.lax.scan(step, carry_in, (img, vol, dmask))
    if reverse:
        lr = lr[::-1]
    if return_carry:
        return lr, final
    return lr


def _scan_diagonal(vol, img, dmask, P1, P2, dx: int, carry_in=None,
                   return_carry: bool = False):
    """Diagonal path aggregation: scan rows top-to-bottom with the carry
    shifted ``dx`` columns per row, so pixel (x, y) continues the path from
    (x-dx, y-1). Columns whose predecessor falls outside the image become
    fresh path starts mid-scan (Lr = C, best = 0 — the same start semantics
    as the straight paths). Callers flip arrays for the other three
    diagonals. vol is (L, N, D).

    ``carry_in`` continues the scan across a sharded row axis (the
    multi-chip wavefront): a (prev_lr, last_best, last_c, has_prev) tuple
    from the upstream shard. Unlike ``_scan_direction`` there is no separate
    seed path — fresh starts are handled per-step by the ``has_prev`` mask,
    so the default init (has_prev all-False) IS the seed carry. With
    ``return_carry`` the final carry is also returned."""
    L, N, D = vol.shape

    def shift1(a, fill):
        rolled = jnp.roll(a, dx, axis=0)
        idx = jnp.arange(N)
        edge = (idx - dx < 0) | (idx - dx >= N)
        if a.ndim > 1:
            edge = edge[:, None]
        return jnp.where(edge, fill, rolled)

    if carry_in is None:
        init = (
            jnp.full((N, D), _MAX_ERROR, vol.dtype),  # prev Lr
            jnp.zeros((N,), vol.dtype),  # lastBest
            jnp.zeros((N,), vol.dtype),  # last intensity
            jnp.zeros((N,), bool),  # has predecessor
        )
    else:
        init = carry_in

    def step(carry, inputs):
        prev, best, last_c, has_prev = carry
        c, cost, mask = inputs
        prev_s = shift1(prev, _MAX_ERROR)
        best_s = shift1(best, 0.0)
        last_c_s = shift1(last_c, 0.0)
        has_s = shift1(has_prev, False)

        p2 = P2 / (1.0 + jnp.abs(last_c_s - c))
        cm = jnp.minimum(_shift_min(prev_s, P1), best_s[..., None] + p2[..., None])
        cr_cont = cm + cost - best_s[..., None]
        cr_seed = cost
        cr = jnp.where(has_s[..., None], cr_cont, cr_seed)
        cr = jnp.where(mask, cr, _MAX_ERROR)
        best_new = jnp.where(has_s, jnp.min(cr, axis=-1), 0.0)
        out = jnp.where(mask, cr, 0.0)
        return (cr, best_new, c, jnp.ones((N,), bool)), out

    final, lr = jax.lax.scan(step, init, (img, vol, dmask))
    if return_carry:
        return lr, final
    return lr


@functools.partial(
    jax.jit,
    static_argnames=("do_horiz", "do_vert", "do_reverse", "do_diagonal", "sd"),
)
def semi_global_matching(
    vol,
    img,
    P1=0.01,
    P2=0.02,
    do_horiz: bool = True,
    do_vert: bool = True,
    do_reverse: bool = True,
    do_diagonal: bool = False,
    sd: int = -1,
):
    """4-path SGM aggregation of cost volume vol (D, H, W) guided by image
    img (H, W). Returns the aggregated (D, H, W) volume
    (SemiGlobalMatching, cu_semi_global_matching.cu:65-86).

    ``sd`` selects the valid-disparity lattice: -1 for a left-anchored volume
    (d <= x, the reference's min(maxDisp, x+1) clip), +1 for a right-anchored
    one (x + d < W). The reference always applies the left clip, even to the
    right volume in stereo2 (a latent bug); we mask correctly per direction.
    """
    D, H, W = vol.shape
    v = jnp.moveaxis(vol.astype(jnp.float32), 0, -1)  # (H, W, D)
    d = jnp.arange(D)[None, None, :]
    x = jnp.arange(W)[None, :, None]
    dmask = (d <= x) if sd < 0 else (x + d < W)
    dmask = jnp.broadcast_to(dmask, (H, W, D))

    out = jnp.zeros_like(v)
    if do_vert:
        # paths along y: scan axis is rows; lines are columns
        out = out + _scan_direction(v, img, dmask, P1, P2, reverse=False)
        if do_reverse:
            out = out + _scan_direction(v, img, dmask, P1, P2, reverse=True)
    if do_horiz:
        vt = jnp.swapaxes(v, 0, 1)  # (W, H, D): scan along x
        it = jnp.swapaxes(img, 0, 1)
        mt = jnp.swapaxes(dmask, 0, 1)
        out = out + jnp.swapaxes(_scan_direction(vt, it, mt, P1, P2, False), 0, 1)
        if do_reverse:
            out = out + jnp.swapaxes(_scan_direction(vt, it, mt, P1, P2, True), 0, 1)
    if do_diagonal:
        # the reference stops at 4 paths (no diagonal kernels); this is the
        # 8-path extension SURVEY.md §7.4 plans for, with the same start
        # semantics as the straight paths (Hirschmueller 2008)
        for flip_y in (False, True):
            for flip_x in (False, True):
                vv = v[::-1] if flip_y else v
                ii = img[::-1] if flip_y else img
                mm = dmask[::-1] if flip_y else dmask
                if flip_x:
                    vv = vv[:, ::-1]
                    ii = ii[:, ::-1]
                    mm = mm[:, ::-1]
                lr = _scan_diagonal(vv, ii, mm, P1, P2, dx=1)
                if flip_x:
                    lr = lr[:, ::-1]
                if flip_y:
                    lr = lr[::-1]
                out = out + lr
    return jnp.moveaxis(out, -1, 0)
