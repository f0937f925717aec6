"""Shape-aware dispatch between Pallas TPU kernels and XLA fallbacks for the
stereo hot path.

Autodiff contract: the Pallas kernels have no VJP rules of their own, so
each dispatched op wraps its kernel in a ``jax.custom_vjp`` whose forward
pass is the kernel and whose backward pass is the **XLA twin's** VJP
(recomputed-forward, like a remat). The twins are bit-identical to the
kernels (tests/test_pallas_kernels.py interpret-mode + bench.py's on-chip
parity gate), so the gradient is exact for the primal actually computed —
``jax.grad`` through any of these ops works on TPU with the Pallas forward
still in place (tests/test_differentiability.py).
"""
from __future__ import annotations

import functools

import jax

from .. import backend
from . import costvolume as _cv
from . import sgm as _sgm


def sgm_shapes_ok(shape) -> bool:
    """Whether a (D, H, W) cost volume fits the Pallas SGM kernels.

    Every Pallas gate that feeds ``sgm_pallas`` (per-frame, stacked-batch,
    sharded reshard) must check this — both scan axes hit
    ``sgm_pallas._aggregate_direction``'s length assert."""
    D, H, W = shape
    from . import sgm_pallas

    R = sgm_pallas.ROWS_PER_STEP
    # non-multiple-of-8 scan lengths up to 128 run as one whole-length
    # block (sgm_pallas._aggregate_direction)
    return ((H % R == 0 or H <= 128) and (W % R == 0 or W <= 128)
            and D % 8 == 0)


def _sgm_shapes_ok(vol) -> bool:
    return sgm_shapes_ok(vol.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _sgm_pallas_vjp(vol, img, P1, P2, do_horiz, do_vert, do_reverse,
                    do_diagonal, sd):
    from . import sgm_pallas

    return sgm_pallas.semi_global_matching(
        vol, img, P1, P2, do_horiz, do_vert, do_reverse, do_diagonal, sd)


def _sgm_fwd(vol, img, P1, P2, dh, dv, dr, dd, sd):
    return _sgm_pallas_vjp(vol, img, P1, P2, dh, dv, dr, dd, sd), (vol, img)


def _sgm_bwd(P1, P2, dh, dv, dr, dd, sd, res, ct):
    vol, img = res
    _, vjp = jax.vjp(
        lambda v, i: _sgm.semi_global_matching(v, i, P1, P2, dh, dv, dr,
                                               dd, sd), vol, img)
    return vjp(ct)


_sgm_pallas_vjp.defvjp(_sgm_fwd, _sgm_bwd)


def semi_global_matching(vol, img, P1=0.01, P2=0.02, do_horiz=True,
                         do_vert=True, do_reverse=True, do_diagonal=False,
                         sd=-1):
    if backend.use_pallas(_sgm_shapes_ok(vol)):
        return _sgm_pallas_vjp(vol, img, float(P1), float(P2), do_horiz,
                               do_vert, do_reverse, do_diagonal, sd)
    return _sgm.semi_global_matching(vol, img, P1, P2, do_horiz, do_vert,
                                     do_reverse, do_diagonal, sd)


def _wta_shapes_ok(vol) -> bool:
    from . import wta_pallas

    D, H, W = vol.shape
    return H % wta_pallas.ROWS == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _wta_subpix_vjp(vol, sd):
    from . import wta_pallas

    return wta_pallas.cost_vol_minimum_subpix(vol, sd)


def _wta_subpix_fwd(vol, sd):
    return _wta_subpix_vjp(vol, sd), vol


def _wta_subpix_bwd(sd, vol, ct):
    _, vjp = jax.vjp(lambda v: _cv.cost_vol_minimum_subpix(v, sd), vol)
    return vjp(ct)


_wta_subpix_vjp.defvjp(_wta_subpix_fwd, _wta_subpix_bwd)


def cost_vol_minimum_subpix(vol, sd=-1):
    if backend.use_pallas(_wta_shapes_ok(vol)):
        return _wta_subpix_vjp(vol, sd)
    return _cv.cost_vol_minimum_subpix(vol, sd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _wta_sq_vjp(vol, last_disp, lam, theta, sd):
    from . import wta_pallas

    return wta_pallas.cost_vol_minimum_square_penalty_subpix(
        vol, last_disp, lam, theta, sd)


def _wta_sq_fwd(vol, last_disp, lam, theta, sd):
    return (_wta_sq_vjp(vol, last_disp, lam, theta, sd),
            (vol, last_disp, lam, theta))


def _wta_sq_bwd(sd, res, ct):
    vol, last_disp, lam, theta = res
    _, vjp = jax.vjp(
        lambda v, d, l, t: _cv.cost_vol_minimum_square_penalty_subpix(
            v, d, l, t, sd), vol, last_disp, lam, theta)
    return vjp(ct)


_wta_sq_vjp.defvjp(_wta_sq_fwd, _wta_sq_bwd)


def cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd=-1):
    if backend.use_pallas(_wta_shapes_ok(vol)):
        import jax.numpy as jnp

        return _wta_sq_vjp(vol, last_disp, jnp.asarray(lam, jnp.float32),
                           jnp.asarray(theta, jnp.float32), sd)
    return _cv.cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _median_vjp(img, max_bad, rad):
    from ..ops import median_pallas

    return median_pallas.median_filter(img, max_bad, rad, reject=True)


def _median_fwd(img, max_bad, rad):
    return _median_vjp(img, max_bad, rad), img


def _median_bwd(max_bad, rad, img, ct):
    from ..ops import median as _median

    _, vjp = jax.vjp(
        lambda x: _median.median_filter_reject_invalid(x, max_bad, rad), img)
    return vjp(ct)


_median_vjp.defvjp(_median_fwd, _median_bwd)


def median_filter_reject_invalid(img, max_bad: int, rad: int = 2):
    from ..ops import median as _median

    if backend.use_pallas(img.ndim == 2):
        return _median_vjp(img, int(max_bad), int(rad))
    return _median.median_filter_reject_invalid(img, max_bad, rad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lr_vjp(disp_l, disp_r, sd, max_diff, max_disp):
    from . import lr_pallas

    return lr_pallas.left_right_check(disp_l, disp_r, sd, max_diff,
                                      max_disp=max_disp)


def _lr_fwd(disp_l, disp_r, sd, max_diff, max_disp):
    return _lr_vjp(disp_l, disp_r, sd, max_diff, max_disp), (disp_l, disp_r)


def _lr_bwd(sd, max_diff, max_disp, res, ct):
    disp_l, disp_r = res
    _, vjp = jax.vjp(
        lambda a, b: _cv.left_right_check(a, b, sd, max_diff), disp_l, disp_r)
    return vjp(ct)


_lr_vjp.defvjp(_lr_fwd, _lr_bwd)


def left_right_check(disp_l, disp_r, sd: int = -1, max_diff=1.0,
                     max_disp: int | None = None):
    if backend.use_pallas(max_disp is not None):
        return _lr_vjp(disp_l, disp_r, sd, float(max_diff), max_disp)
    return _cv.left_right_check(disp_l, disp_r, sd, max_diff)
