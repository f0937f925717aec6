"""Resampling: up/down-sampling and generic warps.

TPU-native equivalent of src/cu_resample.cu: Resample (NN / bilinear / bicubic /
Catmull-Rom, :13-47), BoxHalf 2x2-mean downsample (:54-83), and NaN-aware
BoxHalfIgnoreInvalid (:90-125) that feeds the depth pyramids.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import invalid, sampling

NEAREST = 0
BILINEAR = 1
BICUBIC = 2
CATMULL_ROM = 3

_SAMPLERS = {
    NEAREST: sampling.nearest,
    BILINEAR: sampling.bilinear,
    BICUBIC: sampling.bicubic,
    CATMULL_ROM: sampling.catmull_rom,
    "nearest": sampling.nearest,
    "bilinear": sampling.bilinear,
    "bicubic": sampling.bicubic,
    "catmull_rom": sampling.catmull_rom,
}


def resample(img, out_w: int, out_h: int, method="bilinear"):
    """Resample img to (out_h, out_w) (cu_resample.cu:13-47)."""
    sampler = _SAMPLERS[method]
    in_h, in_w = img.shape[:2]
    y, x = jnp.mgrid[0:out_h, 0:out_w].astype(jnp.float32)
    sx = x * (in_w / out_w)
    sy = y * (in_h / out_h)
    return sampler(img, sx, sy)


def _quad(img):
    """The 2x2 blocks of img as four (H//2, W//2, ...) arrays."""
    h2 = (img.shape[0] // 2) * 2
    w2 = (img.shape[1] // 2) * 2
    c = img[:h2, :w2]
    return c[0::2, 0::2], c[0::2, 1::2], c[1::2, 0::2], c[1::2, 1::2]


def box_half(img):
    """2x2 mean downsample (BoxHalf, cu_resample.cu:54-83)."""
    tl, tr, bl, br = _quad(img.astype(jnp.float32))
    out = (tl + tr + bl + br) / 4.0
    return out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.integer) else out


def box_half_ignore_invalid(img):
    """2x2 mean over the valid entries only (cu_resample.cu:90-125)."""
    quads = _quad(img)
    n = jnp.zeros(quads[0].shape, jnp.float32)
    s = jnp.zeros(quads[0].shape, jnp.float32)
    for q in quads:
        ok = invalid.is_valid(q)
        n = n + ok
        s = s + jnp.where(ok, q.astype(jnp.float32), 0.0)
    out = s / jnp.maximum(n, 1.0)
    bad = n == 0
    if jnp.issubdtype(img.dtype, jnp.floating):
        return jnp.where(bad, jnp.nan, out)
    return jnp.where(bad, invalid.invalid_value(img.dtype), out.astype(img.dtype))
