"""Separable blurs.

TPU-native equivalent of src/cu_blur.cu: the 3-tap binomial Blur (:18-53) with
its border re-normalisation, and the incremental-coefficient GaussianBlur
(GPU Gems 3 ch. 40; :60-137).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _binomial_1d(img, axis: int):
    f = img.astype(jnp.float32)
    prev = jnp.roll(f, 1, axis)
    nxt = jnp.roll(f, -1, axis)
    out = (prev + 2.0 * f + nxt) / 4.0
    # borders: (2*center + inner_neighbour) / 3 (cu_blur.cu:23-28)
    first = jnp.take(f, jnp.array([0]), axis)
    second = jnp.take(f, jnp.array([1]), axis)
    last = jnp.take(f, jnp.array([img.shape[axis] - 1]), axis)
    penult = jnp.take(f, jnp.array([img.shape[axis] - 2]), axis)
    idx = jnp.arange(img.shape[axis])
    shape = [1, 1]
    shape[axis] = -1
    idx = idx.reshape(shape)
    out = jnp.where(idx == 0, (2.0 * first + second) / 3.0, out)
    out = jnp.where(idx == img.shape[axis] - 1, (2.0 * last + penult) / 3.0, out)
    return out


@jax.jit
def blur(img):
    """3-tap binomial blur, X then Y pass (Blur, cu_blur.cu:47-53)."""
    out = _binomial_1d(_binomial_1d(img, 1), 0)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return out.astype(img.dtype)
    return out


def _gaussian_weights(sigma: float, rad: int):
    """Incremental Gaussian coefficients (cu_blur.cu:118-121): g0, g1 = the
    recurrence seeds; weight for offset i is g0 * g1^(i^2) since the kernel
    multiplies g0 *= g1; g1 *= g2 each step."""
    import math

    g0 = 1.0 / (math.sqrt(2.0 * math.pi) * sigma)
    g1 = math.exp(-0.5 / (sigma * sigma))
    w = []
    cur0, cur1 = g0, g1
    g2 = g1 * g1
    for _ in range(rad + 1):
        w.append(cur0)
        cur0 *= cur1
        cur1 *= g2
    return w


@functools.partial(jax.jit, static_argnames=("rad", "clamp255"))
def gaussian_blur(img, sigma, rad: int = 10, clamp255: bool | None = None):
    """Separable Gaussian blur with clamped borders (GaussianBlur,
    cu_blur.cu:60-137).

    The reference's X pass sums offsets 0..RAD-1 and the Y pass 0..RAD (a
    shared-memory tiling artifact); we use the inclusive 0..rad form on both
    axes. The centre tap is counted twice and the sum normalised by 2*gsum,
    exactly as the reference does. uint8 inputs are clamped to [0, 255].
    """
    if clamp255 is None:
        clamp255 = bool(jnp.issubdtype(img.dtype, jnp.integer))
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    i = jnp.arange(rad + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * i * i / (sigma * sigma)) / (jnp.sqrt(2.0 * jnp.pi) * sigma)
    gsum = jnp.sum(w)

    f = img.astype(jnp.float32)
    H, W = f.shape

    def pass_axis(a, axis):
        padded = jnp.pad(a, [(rad, rad) if ax == axis else (0, 0) for ax in range(2)], mode="edge")
        acc = 2.0 * w[0] * a
        for off in range(1, rad + 1):
            lo = jax.lax.dynamic_slice(padded, (rad - off, 0) if axis == 0 else (0, rad - off), (H, W))
            hi = jax.lax.dynamic_slice(padded, (rad + off, 0) if axis == 0 else (0, rad + off), (H, W))
            acc = acc + w[off] * (lo + hi)
        return acc / (2.0 * gsum)

    out = pass_axis(pass_axis(f, 1), 0)
    if clamp255:
        out = jnp.clip(out, 0.0, 255.0)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return out.astype(img.dtype)
    return out
