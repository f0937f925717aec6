"""Integral images, box filtering and the guided filter.

TPU-native equivalent of src/cu_integral_image.cu + cu_integral_image.h. The
reference builds box filters as scan -> transpose -> scan -> 4-corner lookup
(Blelloch shared-memory scans); on TPU the scans are ``jnp.cumsum`` (XLA's
parallel prefix) and the whole pipeline fuses.

``box_filter`` computes the true mean over the clamped inclusive window. The
reference's 4-corner lookup (cu_integral_image.cu:129-166) drops the first
row/column of the window and divides by (winw * winh) instead of
((winw+1) * (winh+1)) — an off-by-one we deliberately correct; the guided
filter (He et al. 2010, cu_integral_image.h:72-93) follows the paper.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def prefix_sum_rows(img):
    """Inclusive row scan (PrefixSumRows, cu_integral_image.cu:55-123)."""
    return jnp.cumsum(img.astype(jnp.float32), axis=1)


def transpose(img):
    """Transpose (cu_integral_image.cu:15-47)."""
    return img.T


def integral_image(img):
    """Full 2D inclusive integral image."""
    return jnp.cumsum(jnp.cumsum(img.astype(jnp.float32), axis=0), axis=1)


@functools.partial(jax.jit, static_argnames=("rad",))
def box_filter(img, rad: int):
    """Mean over the window [x-rad, x+rad] x [y-rad, y+rad] clamped to the
    image (BoxFilter, cu_integral_image.h:24-37)."""
    H, W = img.shape
    ii = jnp.pad(integral_image(img), ((1, 0), (1, 0)))
    y = jnp.arange(H)
    x = jnp.arange(W)
    y0 = jnp.clip(y - rad, 0, H - 1)
    y1 = jnp.clip(y + rad, 0, H - 1)
    x0 = jnp.clip(x - rad, 0, W - 1)
    x1 = jnp.clip(x + rad, 0, W - 1)
    A = ii[y0[:, None], x0[None, :]]
    B = ii[y0[:, None], x1[None, :] + 1]
    C = ii[y1[:, None] + 1, x1[None, :] + 1]
    D = ii[y1[:, None] + 1, x0[None, :]]
    s = C + A - B - D
    area = ((y1 - y0 + 1)[:, None] * (x1 - x0 + 1)[None, :]).astype(jnp.float32)
    return s / area


@functools.partial(jax.jit, static_argnames=("rad",))
def box_filter_integral_image(ii_padded, rad: int):
    """4-corner box mean from a (H+1, W+1) zero-padded inclusive integral
    image (BoxFilterIntegralImage, cu_integral_image.cu:129-166, with the
    window/area off-by-one corrected — see module docstring)."""
    H, W = ii_padded.shape[0] - 1, ii_padded.shape[1] - 1
    y = jnp.arange(H)
    x = jnp.arange(W)
    y0 = jnp.clip(y - rad, 0, H - 1)
    y1 = jnp.clip(y + rad, 0, H - 1)
    x0 = jnp.clip(x - rad, 0, W - 1)
    x1 = jnp.clip(x + rad, 0, W - 1)
    A = ii_padded[y0[:, None], x0[None, :]]
    B = ii_padded[y0[:, None], x1[None, :] + 1]
    C = ii_padded[y1[:, None] + 1, x1[None, :] + 1]
    D = ii_padded[y1[:, None] + 1, x0[None, :]]
    s = C + A - B - D
    area = ((y1 - y0 + 1)[:, None] * (x1 - x0 + 1)[None, :]).astype(jnp.float32)
    return s / area


@functools.partial(jax.jit, static_argnames=("rad",))
def mean_variance(I, rad: int):
    """(var_I, mean_II, mean_I) (ComputeMeanVarience, cu_integral_image.h:41-54)."""
    mean_i = box_filter(I, rad)
    mean_ii = box_filter(I * I, rad)
    return mean_ii - mean_i * mean_i, mean_ii, mean_i


@functools.partial(jax.jit, static_argnames=("rad",))
def covariance(P, I, mean_i, rad: int):
    """(cov_IP, mean_IP, mean_P) (ComputeCovariance, cu_integral_image.h:56-68)."""
    mean_p = box_filter(P, rad)
    mean_ip = box_filter(I * P, rad)
    return mean_ip - mean_i * mean_p, mean_ip, mean_p


@functools.partial(jax.jit, static_argnames=("rad",))
def guided_filter(P, I, rad: int, eps):
    """Guided image filtering (He, Sun, Tang 2010; GuidedFilter,
    cu_integral_image.h:72-93): q = mean_a * I + mean_b."""
    var_i, _, mean_i = mean_variance(I, rad)
    cov_ip, _, mean_p = covariance(P, I, mean_i, rad)
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    mean_a = box_filter(a, rad)
    mean_b = box_filter(b, rad)
    return mean_a * I + mean_b


def guided_filter_volume(vol, I, rad: int, eps):
    """Guided-filter every disparity slice of a (D, H, W) cost volume against
    guide I — the stereo app's cost-volume filtering (stereo/main.cpp:333-347)."""
    return jax.vmap(lambda sl: guided_filter(sl, I, rad, eps))(vol)
