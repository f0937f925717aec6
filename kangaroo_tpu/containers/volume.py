"""Bounded 3D volumes as JAX pytrees.

TPU-native re-design of Volume/BoundedVolume
(include/kangaroo/Volume.h:21-370, BoundedVolume.h:10-170). Voxel data is an
HBM-resident ``(D, H, W)`` array indexed ``data[z, y, x]``; the world-space
AABB rides along as a :class:`~kangaroo_tpu.containers.bbox.BoundingBox`.

The interleaved ``SDF_t {val, w}`` struct (Sdf.h:11-36) becomes two planar
arrays in :class:`TsdfVolume` — structure-of-arrays is the vectorizer-friendly
layout on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .bbox import BoundingBox


def _sub_index_box(bbox: BoundingBox, w: int, h: int, d: int,
                   roi: BoundingBox):
    """Integer voxel index box (inclusive lo, INCLUSIVE hi per axis, xyz
    order) covering ``roi`` ∩ ``bbox``, voxel-aligned outward — the index
    arithmetic of BoundedVolume::SubBoundingVolume (BoundedVolume.h:138-152).
    Callers slice ``data[ilo:ihi + 1]`` so the sub-volume's bbox
    (``blo + ihi * step``) lands exactly on its last voxel plane.
    Host-side: indices are concrete so the sub-array has a static shape."""
    n = np.array([w - 1, h - 1, d - 1], np.float64)
    blo = np.asarray(bbox.lo, np.float64)
    step = (np.asarray(bbox.hi, np.float64) - blo) / n
    lo_w = np.maximum(np.asarray(roi.lo, np.float64), blo)
    hi_w = np.minimum(np.asarray(roi.hi, np.float64), np.asarray(bbox.hi, np.float64))
    if np.any(hi_w < lo_w):
        raise ValueError("roi does not intersect the volume bounds")
    ilo = np.clip(np.floor((lo_w - blo) / step).astype(np.int64), 0, n.astype(np.int64))
    ihi = np.clip(np.ceil((hi_w - blo) / step).astype(np.int64), 0, n.astype(np.int64))
    ihi = np.maximum(ihi, ilo + 1)  # at least two planes so trilinear works
    sub_bbox = BoundingBox.create(blo + ilo * step, blo + ihi * step)
    return ilo, ihi, sub_bbox


def _trilinear_gather(data, pf):
    """Shared trilinear kernel; pf is (..., 3) in voxel coordinates (x, y, z).

    Matches Volume::GetFractionalTrilinearClamped (Volume.h:224-253): base
    indices clamped to [0, n-2], fractions relative to the clamped base.
    """
    D, H, W = data.shape[:3]
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]
    ix = jnp.clip(jnp.floor(fx), 0, W - 2).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(fy), 0, H - 2).astype(jnp.int32)
    iz = jnp.clip(jnp.floor(fz), 0, D - 2).astype(jnp.int32)
    gx = fx - ix
    gy = fy - iy
    gz = fz - iz

    def at(dz, dy, dx):
        return data[iz + dz, iy + dy, ix + dx].astype(jnp.float32)

    c00 = at(0, 0, 0) * (1 - gx) + at(0, 0, 1) * gx
    c01 = at(0, 1, 0) * (1 - gx) + at(0, 1, 1) * gx
    c10 = at(1, 0, 0) * (1 - gx) + at(1, 0, 1) * gx
    c11 = at(1, 1, 0) * (1 - gx) + at(1, 1, 1) * gx
    c0 = c00 * (1 - gy) + c01 * gy
    c1 = c10 * (1 - gy) + c11 * gy
    return c0 * (1 - gz) + c1 * gz


@struct.dataclass
class BoundedVolume:
    """A scalar voxel grid with world-space bounds."""

    data: jnp.ndarray  # (D, H, W), indexed [z, y, x]
    bbox: BoundingBox

    @classmethod
    def create(cls, w: int, h: int, d: int, bbox: BoundingBox | None = None,
               dtype=jnp.float32, fill=0.0) -> "BoundedVolume":
        if bbox is None:
            bbox = BoundingBox.create()
        return cls(jnp.full((d, h, w), fill, dtype), bbox)

    # --- dimensions (BoundedVolume.h:61-76) ---------------------------------
    @property
    def w(self) -> int:
        return self.data.shape[2]

    @property
    def h(self) -> int:
        return self.data.shape[1]

    @property
    def d(self) -> int:
        return self.data.shape[0]

    def size_units(self):
        return self.bbox.size()

    def voxel_size_units(self):
        n = jnp.array([self.w - 1, self.h - 1, self.d - 1], jnp.float32)
        return self.bbox.size() / n

    # --- world-space access (BoundedVolume.h:93-131) ------------------------
    def _world_to_voxel(self, pos_w):
        frac = (jnp.asarray(pos_w) - self.bbox.lo) / self.bbox.size()
        n = jnp.array([self.w - 1, self.h - 1, self.d - 1], jnp.float32)
        return frac * n

    def voxel_positions(self):
        """World position of every voxel center -> (D, H, W, 3).

        BoundedVolume::VoxelPositionInUnits (BoundedVolume.h:115-125).
        """
        z, y, x = jnp.mgrid[0 : self.d, 0 : self.h, 0 : self.w].astype(jnp.float32)
        n = jnp.array([self.w - 1, self.h - 1, self.d - 1], jnp.float32)
        frac = jnp.stack([x, y, z], axis=-1) / n
        return self.bbox.lo + frac * self.bbox.size()

    def sample_trilinear_world(self, pos_w):
        """GetUnitsTrilinearClamped (BoundedVolume.h:93-98)."""
        return _trilinear_gather(self.data, self._world_to_voxel(pos_w))

    def grad_backward_world(self, pos_w):
        """GetUnitsBackwardDiffDxDyDz (BoundedVolume.h:100-106).

        Trilinearly-interpolated backward differences with base index clamped
        to [1, n-2] (Volume.h:269-297), divided by voxel size.
        """
        data = self.data.astype(jnp.float32)
        pf = self._world_to_voxel(pos_w)
        D, H, W = data.shape
        fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]
        ix = jnp.clip(jnp.floor(fx), 1, W - 2).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(fy), 1, H - 2).astype(jnp.int32)
        iz = jnp.clip(jnp.floor(fz), 1, D - 2).astype(jnp.int32)
        gx = fx - ix
        gy = fy - iy
        gz = fz - iz

        def bdiff(dz, dy, dx):
            z, y, x = iz + dz, iy + dy, ix + dx
            v0 = data[z, y, x]
            return jnp.stack(
                [v0 - data[z, y, x - 1], v0 - data[z, y - 1, x], v0 - data[z - 1, y, x]],
                axis=-1,
            )

        gxe = gx[..., None]
        gye = gy[..., None]
        gze = gz[..., None]
        c00 = bdiff(0, 0, 0) * (1 - gxe) + bdiff(0, 0, 1) * gxe
        c01 = bdiff(0, 1, 0) * (1 - gxe) + bdiff(0, 1, 1) * gxe
        c10 = bdiff(1, 0, 0) * (1 - gxe) + bdiff(1, 0, 1) * gxe
        c11 = bdiff(1, 1, 0) * (1 - gxe) + bdiff(1, 1, 1) * gxe
        c0 = c00 * (1 - gye) + c01 * gye
        c1 = c10 * (1 - gye) + c11 * gye
        deriv = c0 * (1 - gze) + c1 * gze
        return deriv / self.voxel_size_units()

    def image_xy(self, z: int):
        """z-slice (Volume::ImageXY, Volume.h:305)."""
        return self.data[z]

    def image_xz(self, y: int):
        """y-slice (Volume::ImageXZ, Volume.h:316)."""
        return self.data[:, y, :]

    # --- sub-volumes (BoundedVolume::SubBoundingVolume, BoundedVolume.h:138)
    def sub_volume(self, roi: BoundingBox):
        """Voxel-aligned sub-volume covering ``roi`` ∩ bounds, plus its
        (z, y, x) index origin in the parent. The reference returns a
        memory-aliasing device view; JAX arrays are immutable, so the
        origin + :meth:`with_sub_volume` write a processed sub-volume back.
        Host-side API (concrete indices → one static shape per distinct
        ROI); the jit-native per-frame frustum crop is
        ``sdf_fuse_separable(clip_planes=True)``'s dynamic plane window."""
        ilo, ihi, sub_bbox = _sub_index_box(self.bbox, self.w, self.h, self.d, roi)
        (x0, y0, z0), (x1, y1, z1) = ilo, ihi
        return (BoundedVolume(self.data[z0:z1 + 1, y0:y1 + 1, x0:x1 + 1], sub_bbox),
                (int(z0), int(y0), int(x0)))

    def with_sub_volume(self, sub: "BoundedVolume", origin) -> "BoundedVolume":
        """Write ``sub``'s data back at ``origin`` (the write-back half of
        the reference's aliasing SubBoundingVolume view)."""
        return BoundedVolume(
            jax.lax.dynamic_update_slice(self.data, sub.data, origin), self.bbox)


@struct.dataclass
class TsdfVolume:
    """Truncated signed-distance volume: planar (val, w) arrays + bounds.

    Replaces BoundedVolume<SDF_t> (Sdf.h:11-36 + BoundedVolume.h).
    """

    val: jnp.ndarray  # (D, H, W) float32 signed distance
    weight: jnp.ndarray  # (D, H, W) float32 accumulation weight
    bbox: BoundingBox

    @classmethod
    def create(cls, w: int, h: int, d: int, bbox: BoundingBox | None = None,
               trunc_dist=1.0) -> "TsdfVolume":
        """Allocates in the SdfReset state: val=trunc_dist, w=0 (cu_sdffusion.cu:144-169)."""
        if bbox is None:
            bbox = BoundingBox.create()
        return cls(
            jnp.full((d, h, w), trunc_dist, jnp.float32),
            jnp.zeros((d, h, w), jnp.float32),
            bbox,
        )

    @property
    def w(self) -> int:
        return self.val.shape[2]

    @property
    def h(self) -> int:
        return self.val.shape[1]

    @property
    def d(self) -> int:
        return self.val.shape[0]

    def as_bounded(self) -> BoundedVolume:
        return BoundedVolume(self.val, self.bbox)

    def reset(self, trunc_dist) -> "TsdfVolume":
        return TsdfVolume(
            jnp.full_like(self.val, trunc_dist), jnp.zeros_like(self.weight), self.bbox
        )

    def voxel_size_units(self):
        return self.as_bounded().voxel_size_units()

    def voxel_positions(self):
        return self.as_bounded().voxel_positions()

    def sample_trilinear_world(self, pos_w):
        return self.as_bounded().sample_trilinear_world(pos_w)

    def grad_backward_world(self, pos_w):
        return self.as_bounded().grad_backward_world(pos_w)

    def sub_volume(self, roi: BoundingBox):
        """Voxel-aligned TSDF sub-volume covering ``roi`` ∩ bounds + its
        (z, y, x) origin — SubBoundingVolume for the fusion volume (the
        reference fuses ``vol.SubBoundingVolume(BoundingBox(T_wl, w, h, K,
        knear, kfar))`` each frame, kinectfusion/main.cpp:345-357). Pair
        with :meth:`with_sub_volume` to write the fused block back."""
        ilo, ihi, sub_bbox = _sub_index_box(self.bbox, self.w, self.h, self.d, roi)
        (x0, y0, z0), (x1, y1, z1) = ilo, ihi
        return (TsdfVolume(self.val[z0:z1 + 1, y0:y1 + 1, x0:x1 + 1],
                           self.weight[z0:z1 + 1, y0:y1 + 1, x0:x1 + 1],
                           sub_bbox),
                (int(z0), int(y0), int(x0)))

    def with_sub_volume(self, sub: "TsdfVolume", origin) -> "TsdfVolume":
        return TsdfVolume(
            jax.lax.dynamic_update_slice(self.val, sub.val, origin),
            jax.lax.dynamic_update_slice(self.weight, sub.weight, origin),
            self.bbox)
