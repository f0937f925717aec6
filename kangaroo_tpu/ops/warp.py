"""Rectification lookup tables and image warping.

TPU-native equivalent of src/cu_lookup_warp.cu: the MATLAB-convention radial
distortion (k1, k2) lookup, optionally composed with a homography, and the
bilinear Warp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import sampling


def create_matlab_lookup_table(w: int, h: int, fu, fv, u0, v0, k1, k2, H_on=None):
    """(H, W, 2) lookup of distorted source coords per rectified pixel
    (CreateMatlabLookupTable, cu_lookup_warp.cu:13-81). With ``H_on`` given,
    the homography maps new image coords to original coords first and the
    result is clamped to [1, dim-2] as in the reference."""
    y, x = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    if H_on is not None:
        Hm = jnp.asarray(H_on, jnp.float32).reshape(3, 3)
        hdiv = Hm[2, 0] * x + Hm[2, 1] * y + Hm[2, 2]
        u = (Hm[0, 0] * x + Hm[0, 1] * y + Hm[0, 2]) / hdiv
        v = (Hm[1, 0] * x + Hm[1, 1] * y + Hm[1, 2]) / hdiv
    else:
        u, v = x, y
    pnu = (u - u0) / fu
    pnv = (v - v0) / fv
    rr = pnu * pnu + pnv * pnv
    rf = 1.0 + k1 * rr + k2 * rr * rr
    lx = pnu * rf * fu + u0
    ly = pnv * rf * fv + v0
    if H_on is not None:
        lx = jnp.clip(lx, 1.0, w - 2.0)
        ly = jnp.clip(ly, 1.0, h - 2.0)
    return jnp.stack([lx, ly], axis=-1)


@jax.jit
def warp(img, lookup):
    """Bilinear warp through a lookup table (Warp, cu_lookup_warp.cu:87-107)."""
    out = sampling.bilinear(img, lookup[..., 0], lookup[..., 1])
    if jnp.issubdtype(img.dtype, jnp.integer):
        return out.astype(img.dtype)
    return out
