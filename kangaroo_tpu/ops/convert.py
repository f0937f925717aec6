"""Pixel-format conversion.

TPU-native equivalent of src/cu_convert.cu + include/kangaroo/pixel_convert.h.
Channel images are (H, W, C) arrays; grayscale is (H, W). The reference's
gray <-> rgb(a) conversions use integer mean (sum/3) for uchar inputs — we
preserve that for uint8 and use float mean otherwise.
"""
from __future__ import annotations

import jax.numpy as jnp


def gray_to_rgb(img):
    """uchar -> uchar3 (pixel_convert.h:22-27)."""
    return jnp.repeat(img[..., None], 3, axis=-1)


def gray_to_rgba(img, alpha=255):
    """uchar -> uchar4 (pixel_convert.h:15-20)."""
    a = jnp.full(img.shape + (1,), alpha, img.dtype)
    return jnp.concatenate([gray_to_rgb(img), a], axis=-1)


def rgb_to_gray(img):
    """uchar3/4 -> uchar: mean of rgb (pixel_convert.h:29-42)."""
    rgb = img[..., :3]
    if jnp.issubdtype(img.dtype, jnp.integer):
        s = rgb.astype(jnp.uint32).sum(axis=-1)
        return (s // 3).astype(img.dtype)
    return rgb.astype(jnp.float32).mean(axis=-1)


def rgb_to_rgba(img, alpha=255):
    a = jnp.full(img.shape[:-1] + (1,), alpha, img.dtype)
    return jnp.concatenate([img, a], axis=-1)


def rgba_to_rgb(img):
    return img[..., :3]


def to_float(img, scale=None):
    """Integer image -> float32; uint8 scaled to [0, 1] when scale is None.
    Float inputs pass through unscaled (ConvertPixel float->float is the
    identity, pixel_convert.h:8-13)."""
    if scale is None:
        scale = (1.0 / 255.0
                 if jnp.issubdtype(jnp.asarray(img).dtype, jnp.integer)
                 else 1.0)
    return img.astype(jnp.float32) * scale


def to_uint8(img, scale=None):
    """float -> uint8 with saturation (ConvertPixel float->uchar truncates;
    we clamp, which only differs on out-of-range inputs). uchar input is the
    identity like the reference's uchar->uchar ConvertPixel — NOT another
    x255 scale."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        return img
    if scale is None:
        scale = 255.0 if not jnp.issubdtype(img.dtype, jnp.integer) else 1.0
    return jnp.clip(img * scale, 0, 255).astype(jnp.uint8)
