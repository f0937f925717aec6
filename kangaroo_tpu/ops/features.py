"""Feature detection: FAST segment test, Harris score, non-maximal suppression.

TPU-native equivalent of src/cu_segment_test.cu. The thrust copy_if compaction
(GetIndices, :192-204) becomes a host-side jnp.nonzero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# FAST ring offsets with the reference's bit numbering (cu_segment_test.cu:40-57):
# (dx, dy, bit)
_RING = [
    (-1, -3, 0), (0, -3, 1), (1, -3, 2), (-2, -2, 15), (2, -2, 3),
    (-3, -1, 14), (3, -1, 4), (-3, 0, 13), (3, 0, 5), (-3, 1, 12),
    (3, 1, 6), (-2, 2, 11), (2, 2, 7), (-1, 3, 10), (0, 3, 9), (1, 3, 8),
]


def _shift(img, dx, dy):
    H, W = img.shape
    padded = jnp.pad(img, 3, mode="edge")
    return jax.lax.dynamic_slice(padded, (3 + dy, 3 + dx), (H, W))


@functools.partial(jax.jit, static_argnames=("min_segment_len",))
def segment_test(img, threshold, min_segment_len: int = 9):
    """FAST-style segment test (SegmentTest, cu_segment_test.cu:16-93).

    Returns uint8 255/0 corner mask. Reproduces the reference's exact bit
    logic including its oppdark quirk ((dark >> 8) | (light << 8),
    cu_segment_test.cu:69)."""
    f = img.astype(jnp.int32)
    t = jnp.asarray(threshold, jnp.int32)
    light = jnp.zeros(img.shape, jnp.uint32)
    dark = jnp.zeros(img.shape, jnp.uint32)
    for dx, dy, bit in _RING:
        q = _shift(f, dx, dy)
        light = light | ((f + t < q).astype(jnp.uint32) << bit)
        dark = dark | ((q < f - t).astype(jnp.uint32) << bit)
    mask16 = jnp.uint32(0xFFFF)
    opplight = (((light >> 8) | (light << 8)) & mask16)
    oppdark = (((dark >> 8) | (light << 8)) & mask16)
    pop = jax.lax.population_count
    corner = (pop(light & opplight) >= min_segment_len) | (
        pop(dark & oppdark) >= min_segment_len
    )
    H, W = img.shape
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    interior = (x >= 3) & (x < W - 3) & (y >= 3) & (y < H - 3)
    return jnp.where(corner & interior, 255, 0).astype(jnp.uint8)


@jax.jit
def harris_score(img, lam=0.04):
    """Harris corner response over a 3x3 structure-tensor window
    (HarrisScore, cu_segment_test.cu:98-146)."""
    f = img.astype(jnp.float32)
    H, W = f.shape
    dx = (_shift(f, 1, 0) - _shift(f, -1, 0)) / 2.0
    dy = (_shift(f, 0, 1) - _shift(f, 0, -1)) / 2.0
    ixx = jnp.zeros_like(f)
    iyy = jnp.zeros_like(f)
    ixy = jnp.zeros_like(f)
    for sy in (-1, 0, 1):
        for sx in (-1, 0, 1):
            gx = _shift(dx, sx, sy)
            gy = _shift(dy, sx, sy)
            ixx = ixx + gx * gx
            iyy = iyy + gy * gy
            ixy = ixy + gx * gy
    ixx, iyy, ixy = ixx / 9.0, iyy / 9.0, ixy / 9.0
    det = ixx * iyy - ixy * ixy
    trace = ixx + iyy
    score = det - lam * trace * trace
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    interior = (x > 1) & (x < W - 1) & (y > 1) & (y < H - 1)
    return jnp.where(interior, score, 0.0)


@functools.partial(jax.jit, static_argnames=("rad",))
def non_maximal_suppression(scores, rad: int = 2, threshold=0.0):
    """255 where the pixel is the strict maximum of its window and above
    threshold (NonMaximalSuppression, cu_segment_test.cu:152-186)."""
    f = scores.astype(jnp.float32)
    H, W = f.shape
    padded = jnp.pad(f, rad, mode="constant", constant_values=-jnp.inf)
    is_max = jnp.ones(f.shape, bool)
    for sy in range(-rad, rad + 1):
        for sx in range(-rad, rad + 1):
            if sx == 0 and sy == 0:
                continue
            q = jax.lax.dynamic_slice(padded, (rad + sy, rad + sx), (H, W))
            is_max = is_max & (q < f)
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    interior = (x > rad) & (x < W - rad) & (y > rad) & (y < H - rad)
    out = jnp.where(is_max & (f > threshold) & interior, 255, 0)
    return out.astype(jnp.uint8)


def get_indices(scores, threshold):
    """Indices of pixels above threshold (GetIndices, cu_segment_test.cu:192-204).

    Host-side compaction: returns (N, 2) int array of (y, x)."""
    import numpy as np

    ys, xs = np.nonzero(np.asarray(scores) > threshold)
    return np.stack([ys, xs], axis=1)
