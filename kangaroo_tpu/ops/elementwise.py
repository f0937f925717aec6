"""Generic elementwise / reduction vocabulary.

TPU-native equivalent of src/cu_operations.cu:1-276: Fill, ScaleBias, Add,
Multiply, Division, Square, MultiplyAdd, and the L1 image reduction. Under
``jit`` XLA fuses these into neighbouring ops, which replaces the reference's
one-kernel-per-op launches.
"""
from __future__ import annotations

import jax.numpy as jnp


def fill(img, value):
    return jnp.full_like(img, value)


def scale_bias(img, scale, bias=0.0):
    """ElementwiseScaleBias (cu_operations.cu)."""
    return img.astype(jnp.float32) * scale + bias


def add(a, b, sa=1.0, sb=1.0, offset=0.0):
    """out = sa*a + sb*b + offset (ElementwiseAdd)."""
    return sa * a.astype(jnp.float32) + sb * b.astype(jnp.float32) + offset


def multiply(a, b, scale=1.0):
    return scale * a.astype(jnp.float32) * b.astype(jnp.float32)


def divide(a, b, sa=1.0, sb=1.0, eps=0.0):
    """out = (sa*a) / (sb*b + eps) (ElementwiseDivision)."""
    return (sa * a.astype(jnp.float32)) / (sb * b.astype(jnp.float32) + eps)


def square(a):
    a = a.astype(jnp.float32)
    return a * a


def multiply_add(a, b, c, sab=1.0, sc=1.0):
    """out = sab*a*b + sc*c (ElementwiseMultiplyAdd)."""
    return sab * a.astype(jnp.float32) * b.astype(jnp.float32) + sc * c.astype(jnp.float32)


def image_l1(img):
    """Sum of |pixel| over the image (ImageL1, cu_operations.cu:219-248)."""
    return jnp.sum(jnp.abs(img.astype(jnp.float32)))
