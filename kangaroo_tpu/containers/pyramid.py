"""Power-of-two image pyramids.

TPU-native equivalent of Pyramid<T, Levels> (include/kangaroo/Pyramid.h:9-137)
plus the host-side builders in include/kangaroo/reduce.h:7-78
(BoxReduce, BoxReduceIgnoreInvalid, BlurReduce). A pyramid is simply a tuple of
arrays, level 0 the finest; tuples are already pytrees, so no wrapper class.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Pyramid = Tuple[jnp.ndarray, ...]


def allocate(img, levels: int) -> Pyramid:
    """Pyramid with level 0 = img and zeroed coarser levels (Pyramid.h:60-78)."""
    pyr = [img]
    for _ in range(1, levels):
        prev = pyr[-1]
        pyr.append(jnp.zeros((prev.shape[0] // 2, prev.shape[1] // 2) + prev.shape[2:], prev.dtype))
    return tuple(pyr)


def box_reduce(img, levels: int) -> Pyramid:
    """2x2 box-mean pyramid (reduce.h BoxReduce:7-24 over cu_resample BoxHalf)."""
    from ..ops import resample

    pyr = [img]
    for _ in range(1, levels):
        pyr.append(resample.box_half(pyr[-1]))
    return tuple(pyr)


def box_reduce_ignore_invalid(img, levels: int) -> Pyramid:
    """NaN-aware box-mean pyramid (reduce.h:26-43, cu_resample BoxHalfIgnoreInvalid)."""
    from ..ops import resample

    pyr = [img]
    for _ in range(1, levels):
        pyr.append(resample.box_half_ignore_invalid(pyr[-1]))
    return tuple(pyr)


def blur_reduce(img, levels: int, temp=None) -> Pyramid:
    """Blur level 0 in place, then box-reduce (reduce.h BlurReduce:45-78)."""
    from ..ops import blur as blur_mod
    from ..ops import resample

    pyr = [blur_mod.blur(img)]
    for _ in range(1, levels):
        pyr.append(resample.box_half(pyr[-1]))
    return tuple(pyr)


def sub_pyramid(pyr: Pyramid, start: int) -> Pyramid:
    """Pyramid.h SubPyramid:100-120."""
    return tuple(pyr[start:])
