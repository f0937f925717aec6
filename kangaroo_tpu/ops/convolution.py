"""Brute-force 2D convolution.

TPU-native equivalent of src/cu_convolution.cu:9-52: arbitrary kernel with
anchor (kx, ky), output normalised by the kernel sum. For unnormalised
convolution (the deconvolution solver's A/A^T applications) use
``convolve(..., normalize=False)``.

The reference samples with GetConditionNeumann(abs(sx), sy) — mirroring
negative x only; we use edge-clamping on both axes, which agrees everywhere
except the reference's idiosyncratic left-edge mirror.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kx", "ky", "normalize"))
def convolve(img, kern, kx: int | None = None, ky: int | None = None, normalize: bool = True):
    kern = jnp.asarray(kern, jnp.float32)
    kh, kw = kern.shape
    if kx is None:
        kx = kw // 2
    if ky is None:
        ky = kh // 2
    f = img.astype(jnp.float32)
    H, W = f.shape
    padded = jnp.pad(f, ((ky, kh - 1 - ky + 1), (kx, kw - 1 - kx + 1)), mode="edge")
    acc = jnp.zeros_like(f)
    for r in range(kh):
        for c in range(kw):
            sl = jax.lax.dynamic_slice(padded, (r, c), (H, W))
            acc = acc + kern[r, c] * sl
    if normalize:
        acc = acc / jnp.sum(kern)
    return acc
