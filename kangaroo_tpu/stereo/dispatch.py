"""Shape-aware dispatch between Pallas TPU kernels and XLA fallbacks for the
stereo hot path."""
from __future__ import annotations

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


def semi_global_matching(vol, img, P1=0.01, P2=0.02, do_horiz=True,
                         do_vert=True, do_reverse=True, do_diagonal=False,
                         sd=-1):
    if backend.use_pallas(_sgm_shapes_ok(vol)):
        from . import sgm_pallas

        return sgm_pallas.semi_global_matching(
            vol, img, float(P1), float(P2), do_horiz, do_vert, do_reverse,
            do_diagonal, sd,
        )
    return _sgm.semi_global_matching(vol, img, P1, P2, do_horiz, do_vert,
                                     do_reverse, do_diagonal, sd)


def _wta_shapes_ok(vol) -> bool:
    from . import wta_pallas

    D, H, W = vol.shape
    return H % wta_pallas.ROWS == 0


def cost_vol_minimum_subpix(vol, sd=-1):
    if backend.use_pallas(_wta_shapes_ok(vol)):
        from . import wta_pallas

        return wta_pallas.cost_vol_minimum_subpix(vol, sd)
    return _cv.cost_vol_minimum_subpix(vol, sd)


def cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd=-1):
    if backend.use_pallas(_wta_shapes_ok(vol)):
        from . import wta_pallas

        return wta_pallas.cost_vol_minimum_square_penalty_subpix(
            vol, last_disp, lam, theta, sd
        )
    return _cv.cost_vol_minimum_square_penalty_subpix(vol, last_disp, lam, theta, sd)


def median_filter_reject_invalid(img, max_bad: int, rad: int = 2):
    from ..ops import median as _median

    if backend.use_pallas(img.ndim == 2):
        from ..ops import median_pallas

        return median_pallas.median_filter(img, max_bad, rad, reject=True)
    return _median.median_filter_reject_invalid(img, max_bad, rad)


def left_right_check(disp_l, disp_r, sd: int = -1, max_diff=1.0,
                     max_disp: int | None = None):
    if backend.use_pallas(max_disp is not None):
        from . import lr_pallas

        return lr_pallas.left_right_check(disp_l, disp_r, sd, float(max_diff),
                                          max_disp=max_disp)
    return _cv.left_right_check(disp_l, disp_r, sd, max_diff)
