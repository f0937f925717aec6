"""Patch matching scores.

TPU-native equivalent of include/kangaroo/patch_score.h:66-298: SinglePixelSq,
SAD, SSD, SSND (zero-mean normalised SSD) and SAND (zero-mean SAD). The CUDA
versions score one (x1, y1)<->(x2, y2) pair per call inside kernels; here each
call scores a whole image against a horizontally shifted partner — the
vectorised form every scanline-stereo consumer needs — via shifted box sums.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift_x(img, dx: int):
    """img sampled at (y, x + dx) with edge clamping."""
    H, W = img.shape
    p = jnp.pad(img, ((0, 0), (abs(dx), abs(dx))), mode="edge")
    return jax.lax.dynamic_slice(p, (0, abs(dx) + dx), (H, W))


def _box_sum(img, rad: int):
    """Sum over the (2rad+1)^2 window, edge-clamped."""
    k = 2 * rad + 1
    p = jnp.pad(img, rad, mode="edge")
    s = jnp.cumsum(jnp.pad(p, ((1, 0), (0, 0))), axis=0)
    p = s[k:] - s[:-k]
    s = jnp.cumsum(jnp.pad(p, ((0, 0), (1, 0))), axis=1)
    return s[:, k:] - s[:, :-k]


def _line_sum(img, rad: int):
    """Sum over the horizontal (2rad+1)-wide line, edge-clamped."""
    k = 2 * rad + 1
    p = jnp.pad(img, ((0, 0), (rad, rad)), mode="edge")
    s = jnp.cumsum(jnp.pad(p, ((0, 0), (1, 0))), axis=1)
    return s[:, k:] - s[:, :-k]


@functools.partial(jax.jit, static_argnames=("dx", "rad", "kind"))
def score_shifted(img1, img2, dx: int, rad: int = 1, kind: str = "sad"):
    """Per-pixel patch score of img1 at (x, y) vs img2 at (x + dx, y).

    kind: 'pixel' (SinglePixelSq), 'sad', 'ssd', 'sand' (zero-mean SAD),
    'ssnd' (zero-mean SSD), 'ssnd_line' (SSND over the 1-row line).
    patch_score.h:82-298.
    """
    a = img1.astype(jnp.float32)
    b = _shift_x(img2.astype(jnp.float32), dx)
    if kind == "pixel":
        d = a - b
        return d * d
    if kind == "ssnd_line":
        # SSNDLineScore (patch_score.h:211-255): the SSND arithmetic over a
        # height-1 line, but keeping the SQUARE patch count n = w*w as the
        # mean normaliser (the reference reuses the patch formula verbatim).
        # The quadratic expands exactly to sum(d^2) - sum(d)^2 / n with
        # d = a - b; we reproduce the n = w^2 quirk bit-for-bit.
        n = float((2 * rad + 1) ** 2)
        d = a - b
        sd = _line_sum(d, rad)
        return _line_sum(d * d, rad) - sd * sd / n
    area = float((2 * rad + 1) ** 2)
    if kind in ("sand", "ssnd"):
        # zero-mean scores subtract each CENTRE patch's mean from its pixels
        # (patch_score.h:186-298): sum_o f(a(p+o) - b(q+o) - (mean_a - mean_b))
        dm = (_box_sum(a, rad) - _box_sum(b, rad)) / area
        d = a - b
        H, W = d.shape
        p = jnp.pad(d, rad, mode="edge")
        acc = jnp.zeros_like(d)
        for dy in range(2 * rad + 1):
            for dx2 in range(2 * rad + 1):
                t = jax.lax.dynamic_slice(p, (dy, dx2), (H, W)) - dm
                acc = acc + (t * t if kind == "ssnd" else jnp.abs(t))
        return acc
    d = a - b
    if kind == "sad":
        return _box_sum(jnp.abs(d), rad)
    if kind == "ssd":
        return _box_sum(d * d, rad)
    raise ValueError(kind)
