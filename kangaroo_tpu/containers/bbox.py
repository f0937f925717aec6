"""Axis-aligned bounding boxes in world units.

TPU-native equivalent of include/kangaroo/BoundingBox.h. ``lo``/``hi`` are (3,)
float32 arrays ordered (x, y, z).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BoundingBox:
    lo: jnp.ndarray  # (3,) min corner
    hi: jnp.ndarray  # (3,) max corner

    @classmethod
    def create(cls, lo=(-1.0, -1.0, -1.0), hi=(1.0, 1.0, 1.0)) -> "BoundingBox":
        return cls(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32))

    @classmethod
    def empty(cls) -> "BoundingBox":
        """Inverted box that Insert()s grow from (BoundingBox.h default ctor)."""
        big = jnp.float32(3.4e38)
        return cls(jnp.full((3,), big), jnp.full((3,), -big))

    def size(self):
        return self.hi - self.lo

    def half_size(self):
        return 0.5 * self.size()

    def center(self):
        return 0.5 * (self.lo + self.hi)

    def insert(self, p) -> "BoundingBox":
        """Grow to include point(s) p of shape (..., 3) (BoundingBox.h Insert)."""
        p = jnp.asarray(p, jnp.float32).reshape(-1, 3)
        return BoundingBox(
            jnp.minimum(self.lo, p.min(axis=0)), jnp.maximum(self.hi, p.max(axis=0))
        )

    def intersect(self, o: "BoundingBox") -> "BoundingBox":
        return BoundingBox(jnp.maximum(self.lo, o.lo), jnp.minimum(self.hi, o.hi))

    def enlarge(self, factor) -> "BoundingBox":
        c, h = self.center(), self.half_size()
        return BoundingBox(c - factor * h, c + factor * h)

    def contains(self, p):
        p = jnp.asarray(p)
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)


def fit_to_frustum(K, w: int, h: int, T_wc, near, far) -> BoundingBox:
    """AABB containing the camera frustum (BoundingBox.h:72-106).

    Inserts the camera center and the 4 image-corner rays at ``near`` and ``far``
    transformed to world frame via T_wc (3, 4).
    """
    from ..core import se3

    corners = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]], jnp.float32
    )
    rays_c = K.unproject(corners[:, 0], corners[:, 1])  # (4, 3)
    pts = jnp.concatenate([near * rays_c, far * rays_c], axis=0)
    pts_w = se3.transform(T_wc, pts)
    cam_w = se3.translation(T_wc)[None]
    allpts = jnp.concatenate([pts_w, cam_w], axis=0)
    return BoundingBox(allpts.min(axis=0), allpts.max(axis=0))
