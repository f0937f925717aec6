"""Visualisation helpers: anaglyphs, HSV heat-map overlays, painting.

TPU-native equivalent of src/cu_anaglyph.cu, src/cu_remap.cu and
src/cu_painting.cu, plus the disparity cross-section debug view
(cu_dense_stereo.cu:552-574).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def make_anaglyph(left, right, color_code: bool = False):
    """Red/cyan anaglyph from a grayscale stereo pair (MakeAnaglyth,
    cu_anaglyph.cu:11-42). Returns (H, W, 4) uint8."""
    l8 = left.astype(jnp.uint8)
    r8 = right.astype(jnp.uint8)
    a = jnp.full(left.shape, 255, jnp.uint8)
    return jnp.stack([l8, r8, r8, a], axis=-1)


def _hsv_to_rgb(h, s, v):
    """hsv2rgb (cu_remap.cu:13-29); h in [0, 1)."""
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


@jax.jit
def remap_heat(img, score, score_min, score_max):
    """Overlay a normalised score as an HSV heat map on a grayscale image
    (Remap, cu_remap.cu:35-58). Returns (H, W, 3) float in [0, 1]."""
    t = jnp.clip((score - score_min) / (score_max - score_min), 0.0, 1.0)
    heat = _hsv_to_rgb((1.0 - t) * (2.0 / 3.0), jnp.ones_like(t), jnp.ones_like(t))
    base = img.astype(jnp.float32)
    base = jnp.where(jnp.isfinite(base), base, 0.0)
    base = base / jnp.maximum(base.max(), 1e-6)
    return 0.5 * base[..., None] + 0.5 * heat


@jax.jit
def paint_circle(img, value, cx, cy, radius):
    """Set pixels within radius of (cx, cy) (PaintCircle, cu_painting.cu:12-40)."""
    H, W = img.shape[:2]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    inside = (x - cx) ** 2 + (y - cy) ** 2 <= radius * radius
    return jnp.where(inside, jnp.asarray(value, img.dtype), img)


def disparity_cross_section(vol, disp, y: int):
    """Cost-volume slice at row y with the chosen disparity marked
    (DisparityImageCrossSection, cu_dense_stereo.cu:552-574). Returns
    (D, W, 3) float viz."""
    D, H, W = vol.shape
    sl = vol[:, y, :]
    sl = (sl - sl.min()) / jnp.maximum(sl.max() - sl.min(), 1e-9)
    rgb = jnp.repeat(sl[..., None], 3, axis=-1)
    d = jnp.arange(D, dtype=jnp.float32)[:, None]
    chosen = jnp.abs(d - disp[y][None, :]) < 0.5
    marker = jnp.stack([jnp.ones_like(sl), jnp.zeros_like(sl), jnp.zeros_like(sl)], -1)
    return jnp.where(chosen[..., None], marker, rgb)
