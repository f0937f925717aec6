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


def _window_area(H, W, rad: int):
    y = jnp.arange(H)
    x = jnp.arange(W)
    ny = jnp.clip(y + rad, 0, H - 1) - jnp.clip(y - rad, 0, H - 1) + 1
    nx = jnp.clip(x + rad, 0, W - 1) - jnp.clip(x - rad, 0, W - 1) + 1
    return (ny[:, None] * nx[None, :]).astype(jnp.float32)


def _box_sum_and_area(ii, rad: int):
    """Clamped-window 4-corner box sum from a (H+1, W+1) front-padded
    inclusive integral image, as edge-pads + pure slices: the natural
    ii[clip(y-rad), clip(x-rad)] fancy indexing lowers to four image-sized
    GATHERS on TPU, but with a static radius every corner lookup is a
    monotone saturated shift — i.e. an edge-replicated pad followed by a
    contiguous slice."""
    H, W = ii.shape[0] - 1, ii.shape[1] - 1
    # rows: A/B read clip(y - rad, 0, H-1); C/D read min(y + rad + 1, H)
    rows_ab = jnp.pad(ii, ((rad, 0), (0, 0)), mode="edge")[:H]
    rows_cd = jnp.pad(ii, ((0, rad), (0, 0)), mode="edge")[rad + 1:rad + 1 + H]

    def cols_ad(m):  # clip(x - rad, 0, W-1)
        return jnp.pad(m, ((0, 0), (rad, 0)), mode="edge")[:, :W]

    def cols_bc(m):  # min(x + rad + 1, W)
        return jnp.pad(m, ((0, 0), (0, rad)), mode="edge")[:, rad + 1:rad + 1 + W]

    s = cols_bc(rows_cd) + cols_ad(rows_ab) - cols_bc(rows_ab) - cols_ad(rows_cd)
    return s, _window_area(H, W, rad)


@functools.partial(jax.jit, static_argnames=("rad",))
def box_filter(img, rad: int):
    """Mean over the window [x-rad, x+rad] x [y-rad, y+rad] clamped to the
    image (BoxFilter, cu_integral_image.h:24-37).

    Small radii sum directly with two separable reduce_windows (one native
    TPU pass per axis); cumsum-based integral images cost O(log W) passes
    per scan on TPU, which made the guided filter ~10x slower than
    necessary at the radii the apps use. Large radii keep the
    integral-image path (constant cost in rad)."""
    H, W = img.shape
    if rad <= 16:
        f = img.astype(jnp.float32)
        w = 2 * rad + 1
        s = jax.lax.reduce_window(f, 0.0, jax.lax.add, (w, 1), (1, 1), "SAME")
        s = jax.lax.reduce_window(s, 0.0, jax.lax.add, (1, w), (1, 1), "SAME")
        return s / _window_area(H, W, rad)
    ii = jnp.pad(integral_image(img), ((1, 0), (1, 0)))
    s, area = _box_sum_and_area(ii, rad)
    return s / area


@functools.partial(jax.jit, static_argnames=("rad",))
def box_filter_integral_image(ii_padded, rad: int):
    """4-corner box mean from a (H+1, W+1) zero-padded inclusive integral
    image (BoxFilterIntegralImage, cu_integral_image.cu:129-166, with the
    window/area off-by-one corrected — see module docstring)."""
    s, area = _box_sum_and_area(ii_padded, rad)
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


def _guided_with_stats(P, I, var_i, mean_i, rad: int, eps):
    """Guided-filter P against guide I given precomputed guide stats."""
    cov_ip, _, mean_p = covariance(P, I, mean_i, rad)
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box_filter(a, rad) * I + box_filter(b, rad)


@functools.partial(jax.jit, static_argnames=("rad",))
def guided_filter(P, I, rad: int, eps):
    """Guided image filtering (He, Sun, Tang 2010; GuidedFilter,
    cu_integral_image.h:72-93): q = mean_a * I + mean_b."""
    var_i, _, mean_i = mean_variance(I, rad)
    return _guided_with_stats(P, I, var_i, mean_i, rad, eps)


def guided_filter_volume(vol, I, rad: int, eps):
    """Guided-filter every disparity slice of a (D, H, W) cost volume against
    guide I — the stereo app's cost-volume filtering (stereo/main.cpp:333-347).
    The guide statistics (mean_I, var_I) are shared by every slice and
    computed once, not per slice."""
    var_i, _, mean_i = mean_variance(I, rad)
    return jax.vmap(
        lambda sl: _guided_with_stats(sl, I, var_i, mean_i, rad, eps))(vol)
