"""Invalid-value sentinels, mirroring include/kangaroo/InvalidValue.h:15-83.

float -> NaN, unsigned ints -> 0, signed ints -> -1. Validity masks propagate
invalid pixels end-to-end exactly as in the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def invalid_value(dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.nan, dtype)
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return jnp.array(0, dtype)
    return jnp.array(-1, dtype)


def is_valid(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.isfinite(x)
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        return x != 0
    return x >= 0


def invalid_like(x):
    return jnp.full_like(x, invalid_value(jnp.asarray(x).dtype))


def np_invalid_value(dtype):
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.floating):
        return dtype.type(np.nan)
    if np.issubdtype(dtype, np.unsignedinteger):
        return dtype.type(0)
    return dtype.type(-1)
