"""Rolling (moving-workspace) TSDF volume.

Capability-equivalent of extra/LocalTileGrid.h (:1-167), the reference's
sketch of a camera-following tile grid of volumes (the Kintinuous
moving-volume idea). A pointer-linked tile grid is the wrong shape for XLA;
the TPU-native equivalent keeps ONE dense volume and rolls it by whole
voxels when the camera strays from the centre: `jnp.roll` along each axis,
invalidate the vacated slabs, translate the bbox. All elementwise — no
gathers — and compatible with the z-sharded layout (rolls lower to
collective-permutes across shards).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..containers.bbox import BoundingBox
from ..containers.volume import TsdfVolume
from ..core import se3


def _roll_plane(data, shift_xyz, reset_val):
    """Roll one (D, H, W) voxel plane by whole voxels along [z, y, x],
    resetting vacated slabs to ``reset_val``. Array layout is [z, y, x];
    shifting the WINDOW by +s means content moves -s inside the array.
    Shared by roll_volume (val + weight) and roll_bounded_volume so the
    paired TSDF/colour rolls stay bit-identical by construction."""
    sx, sy, sz = [int(s) for s in shift_xyz]
    D, H, W = data.shape
    for axis, s, n in ((2, sx, W), (1, sy, H), (0, sz, D)):
        if s == 0:
            continue
        data = jnp.roll(data, -s, axis=axis)
        idx = jnp.arange(n)
        vacated = (idx >= n - s) if s > 0 else (idx < -s)
        shape = [1, 1, 1]
        shape[axis] = n
        data = jnp.where(vacated.reshape(shape), reset_val, data)
    return data


def _rolled_bbox(bbox: BoundingBox, shift_xyz, step) -> BoundingBox:
    offset = np.asarray(step) * np.array([int(s) for s in shift_xyz],
                                         np.float32)
    return BoundingBox(bbox.lo + offset, bbox.hi + offset)


def roll_volume(vol: TsdfVolume, shift_xyz, reset_val=jnp.nan) -> TsdfVolume:
    """Shift the volume ``shift_xyz`` voxels along world (x, y, z): geometry
    stays put in world space (the bbox translates), freshly exposed slabs
    reset to (reset_val, weight 0)."""
    val = _roll_plane(vol.val, shift_xyz, reset_val)
    weight = _roll_plane(vol.weight, shift_xyz, 0.0)
    bbox = _rolled_bbox(vol.bbox, shift_xyz, vol.voxel_size_units())
    return TsdfVolume(val, weight, bbox)


def roll_bounded_volume(bv, shift_xyz, reset_val=0.5):
    """Roll a plain BoundedVolume (e.g. the colour volume) by the same
    whole-voxel shift as its paired TSDF (:func:`roll_volume`); vacated
    slabs reset to ``reset_val`` (SdfReset(colorVol) fills 0.5,
    cu_sdffusion.cu:166-169)."""
    from ..containers.volume import BoundedVolume

    data = _roll_plane(bv.data, shift_xyz, reset_val)
    bbox = _rolled_bbox(bv.bbox, shift_xyz, bv.voxel_size_units())
    return BoundedVolume(data, bbox)


def recenter_shift(vol: TsdfVolume, T_wc, lead: float = 0.5,
                   threshold_voxels: int = 8) -> Tuple[int, int, int]:
    """Whole-voxel shift that re-centres the volume on a point ``lead``
    metres in front of the camera; zero until the drift exceeds
    ``threshold_voxels`` on an axis (hysteresis, so tracking noise does not
    thrash the volume). Host-side helper: returns plain ints."""
    T = np.asarray(T_wc)
    target = T[:, 3] + T[:, 2] * lead  # camera centre + lead * view dir
    centre = np.asarray((vol.bbox.lo + vol.bbox.hi)) / 2.0
    step = np.asarray(vol.voxel_size_units())
    drift = np.round((target - centre) / step).astype(int)
    drift[np.abs(drift) < threshold_voxels] = 0
    return int(drift[0]), int(drift[1]), int(drift[2])


def follow_camera(vol: TsdfVolume, T_wc, lead: float = 0.5,
                  threshold_voxels: int = 8,
                  reset_val=jnp.nan) -> TsdfVolume:
    """Keep the working volume around the camera (the LocalTileGrid role):
    compute the recentring shift and roll if needed."""
    shift = recenter_shift(vol, T_wc, lead, threshold_voxels)
    if shift == (0, 0, 0):
        return vol
    return roll_volume(vol, shift, reset_val)
