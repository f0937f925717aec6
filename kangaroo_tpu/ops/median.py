"""Median filters.

TPU-native equivalent of src/cu_median.cu: MedianFilter3x3/5x5 exchange-network
medians (:42-159) and MedianFilterRejectNegative{5x5,7x7,9x9} (:161-352) that
ignore invalid entries (used to clean disparity maps).

Implementation gathers the window into a (H, W, k*k) tensor and sorts along
the window axis — the XLA sort on a 25-wide minor axis lowers to a fixed
sorting network on the VPU, the moral equivalent of the reference's
exchange/bitonic networks. Image borders use clamped (edge-replicate)
neighbours; the reference zero-pads at CUDA *block* borders (an artifact of
its shared-memory tiling, cu_median.cu:55-63) which we deliberately do not
reproduce.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import invalid as invalid_mod


def _window_stack(img, rad: int):
    H, W = img.shape
    padded = jnp.pad(img, rad, mode="edge")
    cols = []
    for dy in range(2 * rad + 1):
        for dx in range(2 * rad + 1):
            cols.append(jax.lax.dynamic_slice(padded, (dy, dx), (H, W)))
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("rad",))
def median_filter(img, rad: int = 1):
    """Plain median over a (2*rad+1)^2 window (MedianFilter3x3/5x5)."""
    win = _window_stack(img, rad)
    k = win.shape[-1]
    return jnp.sort(win, axis=-1)[..., k // 2]


def median_filter_3x3(img):
    return median_filter(img, 1)


def median_filter_5x5(img):
    return median_filter(img, 2)


@functools.partial(jax.jit, static_argnames=("rad",))
def median_filter_reject_invalid(img, max_bad: int, rad: int = 2):
    """Median ignoring invalid entries (MedianFilterRejectNegative5x5 et al.,
    cu_median.cu:161-352).

    Invalid values sort to the top (+inf); the output is element
    (kpix + bad) // 2 of the sorted window — the median of the valid entries —
    unless bad >= max_bad (or all bad), in which case the pixel is invalidated.
    """
    win = _window_stack(img, rad)
    k = win.shape[-1]
    valid = invalid_mod.is_valid(win)
    bad = jnp.sum(~valid, axis=-1)
    sorted_win = jnp.sort(jnp.where(valid, win, jnp.inf), axis=-1)
    idx = jnp.minimum((k + bad) // 2, k - 1)
    med = jnp.take_along_axis(sorted_win, idx[..., None], axis=-1)[..., 0]
    ok = (bad < max_bad) & (bad < k)
    return jnp.where(ok, med, invalid_mod.invalid_value(img.dtype))


def median_filter_reject_negative_5x5(img, max_bad: int):
    return median_filter_reject_invalid(img, max_bad, rad=2)


def median_filter_reject_negative_7x7(img, max_bad: int):
    return median_filter_reject_invalid(img, max_bad, rad=3)


def median_filter_reject_negative_9x9(img, max_bad: int):
    return median_filter_reject_invalid(img, max_bad, rad=4)
