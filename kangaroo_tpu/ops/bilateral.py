"""Bilateral filtering.

TPU-native equivalent of src/cu_bilateral.cu's three overloads: plain
spatial+range (:13-53), min-value masked for depth maps (:59-104, used on
Kinect depth with minval=0.2), and cross/joint bilateral guided by a second
image (:110-155). Brute-force window, exp weights, clamped borders.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _offsets(size: int):
    return [(r, c) for r in range(-size, size + 1) for c in range(-size, size + 1)]


def _shift(padded, r, c, H, W, size):
    return jax.lax.dynamic_slice(padded, (size + r, size + c), (H, W))


@functools.partial(jax.jit, static_argnames=("size",))
def bilateral(img, gs, gr, size: int = 5):
    """Plain bilateral filter (cu_bilateral.cu:13-53)."""
    f = img.astype(jnp.float32)
    H, W = f.shape
    padded = jnp.pad(f, size, mode="edge")
    inv2gs2 = -1.0 / (2.0 * gs * gs)
    inv2gr2 = -1.0 / (2.0 * gr * gr)
    s = jnp.zeros_like(f)
    sw = jnp.zeros_like(f)
    for r, c in _offsets(size):
        q = _shift(padded, r, c, H, W, size)
        w = jnp.exp((r * r + c * c) * inv2gs2) * jnp.exp((f - q) ** 2 * inv2gr2)
        s = s + w * q
        sw = sw + w
    return s / sw


@functools.partial(jax.jit, static_argnames=("size",))
def bilateral_above_min(img, gs, gr, size: int, minval):
    """Bilateral filter ignoring samples below minval; pixels whose centre is
    below minval come out NaN — the reference skips the whole window and
    writes sum/sumw = 0/0 (cu_bilateral.cu:71-90), which is how KinectFusion
    turns too-close sensor readings into invalid depth
    (kinectfusion/main.cpp:209). NaN centres stay NaN."""
    f = img.astype(jnp.float32)
    H, W = f.shape
    padded = jnp.pad(f, size, mode="edge")
    inv2gs2 = -1.0 / (2.0 * gs * gs)
    inv2gr2 = -1.0 / (2.0 * gr * gr)
    s = jnp.zeros_like(f)
    sw = jnp.zeros_like(f)
    for r, c in _offsets(size):
        q = _shift(padded, r, c, H, W, size)
        ok = q >= minval
        w = jnp.where(ok, jnp.exp((r * r + c * c) * inv2gs2) * jnp.exp((f - q) ** 2 * inv2gr2), 0.0)
        s = s + w * jnp.where(ok, q, 0.0)
        sw = sw + w
    out = s / sw
    return jnp.where(f >= minval, out, jnp.nan)


@functools.partial(jax.jit, static_argnames=("size",))
def bilateral_cross(img, guide, gs, gr, size: int, gc=None):
    """Cross/joint bilateral guided by a second image
    (cu_bilateral.cu:110-155).

    The reference kernel weighs each window sample by THREE Gaussians:
    spatial (``gs``), self range on the filtered values p-q (``gr``) and
    colour range on the guide pc-qc (``gc``). With ``gc=None`` (legacy
    2-weight form) the self-range term is dropped and ``gr`` applies to the
    guide instead — the joint-bilateral special case (reference semantics
    with gr -> inf, relabelling gc as gr)."""
    f = img.astype(jnp.float32)
    g = guide.astype(jnp.float32)
    H, W = f.shape
    pf = jnp.pad(f, size, mode="edge")
    pg = jnp.pad(g, size, mode="edge")
    inv2gs2 = -1.0 / (2.0 * gs * gs)
    inv2gr2 = -1.0 / (2.0 * gr * gr)
    s = jnp.zeros_like(f)
    sw = jnp.zeros_like(f)
    if gc is not None:
        inv2gc2 = -1.0 / (2.0 * gc * gc)
    for r, c in _offsets(size):
        q = _shift(pf, r, c, H, W, size)
        qg = _shift(pg, r, c, H, W, size)
        w = jnp.exp((r * r + c * c) * inv2gs2)
        if gc is None:
            w = w * jnp.exp((g - qg) ** 2 * inv2gr2)
        else:
            w = w * jnp.exp((f - q) ** 2 * inv2gr2)
            w = w * jnp.exp((g - qg) ** 2 * inv2gc2)
        s = s + w * q
        sw = sw + w
    # the centre tap always contributes weight exp(0)^3 = 1, so sumw > 0;
    # the reference's `sumw == 0 ? p` guard can never fire for either of us
    return s / sw


def bilateral_volume(vol, guide, gs, gr, size: int = 2, gc=None):
    """Cross-bilateral filter every disparity slice of a (D, H, W) cost
    volume against the guide image — stereo2's applyBilateralFilter pass
    (applications/stereo2/main.cpp:408-420, per-slice
    `BilateralFilter<float,float,float>(P, temp, I, gs, gr, gc, win)`).
    Pass ``gc`` for the reference's full 3-weight form (self range ``gr``
    on the cost values, guide range ``gc`` on the image)."""
    import jax

    return jax.vmap(
        lambda sl: bilateral_cross(sl, guide, gs, gr, size, gc=gc))(vol)
