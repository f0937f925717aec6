"""Pinhole camera intrinsics as a JAX pytree.

TPU-native re-design of the reference's pinhole camera model
(include/kangaroo/ImageIntrinsics.h:51-200): Project/Unproject, per-pyramid-level
scaling ``K[l]`` (ImageIntrinsics.h:137-142), and the K matrix accessors.

Points are (..., 3) arrays ordered (x, y, z); pixels are (..., 2) ordered (u, v).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Intrinsics:
    """fu, fv focal lengths; u0, v0 principal point (pixels)."""

    fu: jnp.ndarray
    fv: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray

    @classmethod
    def create(cls, fu, fv=None, u0=0.0, v0=0.0) -> "Intrinsics":
        if fv is None:
            fv = fu
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f32(fu), f32(fv), f32(u0), f32(v0))

    @classmethod
    def centered(cls, f, w: int, h: int) -> "Intrinsics":
        """Focal f with principal point at the image center.

        Mirrors ImageIntrinsics(float f, const Image&) (ImageIntrinsics.h:76-81).
        """
        return cls.create(f, f, w / 2.0 - 0.5, h / 2.0 - 0.5)

    def project(self, P):
        """(..., 3) camera-frame points -> (..., 2) pixels. ImageIntrinsics.h:87-97."""
        P = jnp.asarray(P)
        z = P[..., 2]
        return jnp.stack(
            [self.u0 + self.fu * P[..., 0] / z, self.v0 + self.fv * P[..., 1] / z],
            axis=-1,
        )

    def unproject(self, u, v, z=None):
        """Pixel (u, v) -> camera ray (x, y, 1), scaled by z if given.

        ImageIntrinsics.h:109-131.
        """
        u = jnp.asarray(u, jnp.float32)
        v = jnp.asarray(v, jnp.float32)
        ray = jnp.stack(
            [(u - self.u0) / self.fu, (v - self.v0) / self.fv, jnp.ones_like(u)],
            axis=-1,
        )
        if z is None:
            return ray
        return ray * jnp.asarray(z, jnp.float32)[..., None]

    def unproject_grid(self, w: int, h: int, z=None):
        """Rays for every pixel of an (h, w) image -> (h, w, 3)."""
        v, u = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
        return self.unproject(u, v, z)

    def level(self, l: int) -> "Intrinsics":
        """Intrinsics for power-of-two pyramid level ``l`` (ImageIntrinsics.h:137-142)."""
        s = 1.0 / (1 << l)
        return Intrinsics(
            s * self.fu, s * self.fv, s * (self.u0 + 0.5) - 0.5, s * (self.v0 + 0.5) - 0.5
        )

    def scale(self, s) -> "Intrinsics":
        """Scale focal lengths only (ImageIntrinsics.h:148-157)."""
        return Intrinsics(self.fu * s, self.fv * s, self.u0, self.v0)

    def matrix(self):
        """3x3 K matrix (ImageIntrinsics.h:176-182)."""
        z = jnp.zeros(())
        o = jnp.ones(())
        return jnp.stack(
            [
                jnp.stack([self.fu, z, self.u0]),
                jnp.stack([z, self.fv, self.v0]),
                jnp.stack([z, z, o]),
            ]
        )

    def inverse_matrix(self):
        z = jnp.zeros(())
        o = jnp.ones(())
        return jnp.stack(
            [
                jnp.stack([1.0 / self.fu, z, -self.u0 / self.fu]),
                jnp.stack([z, 1.0 / self.fv, -self.v0 / self.fv]),
                jnp.stack([z, z, o]),
            ]
        )


def level_from_max_pixels(w: int, h: int, maxpixels: int) -> int:
    """Smallest pyramid level whose image has <= maxpixels (ImageIntrinsics.h:41-48)."""
    level = 0
    while (w >> level) * (h >> level) > maxpixels:
        level += 1
    return level
