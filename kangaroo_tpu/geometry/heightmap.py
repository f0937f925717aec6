"""Heightmap fusion on a z=0 grid.

TPU-native equivalent of src/cu_heightmap.cu + extra/HeightmapFusion.h. The
CUDA scatter update is race-prone (multiple pixels binning to one cell,
cu_heightmap.cu:22-59); under XLA the scatter becomes an explicit
segment-mean, which is deterministic — the reference's known benign race
disappears by construction (SURVEY.md §5).

Heightmap state is a (Hh, Wh, 4) array per cell: (mean height, count,
mean colour, unused), matching the reference's float4 layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import se3


def init_heightmap(w: int, h: int):
    """(InitHeightMap, cu_heightmap.cu:14-18)."""
    hm = jnp.zeros((h, w, 4), jnp.float32)
    return hm.at[..., 2].set(128.0)


@jax.jit
def update_heightmap(hm, points, image, T_hc, min_height=-1e10, max_height=1e10,
                     max_distance=1e10):
    """Bin camera-frame points into the grid, updating running mean height and
    colour (UpdateHeightMap, cu_heightmap.cu:22-66).

    points: (H, W, 4) camera-frame point image; image: (H, W) uint8 colour or
    None; T_hc: (3, 4) camera -> heightmap. The reference's racy in-place
    scatter becomes a segment sum: all samples landing in one cell contribute,
    then the running mean absorbs them in one step.
    """
    Hh, Wh = hm.shape[:2]
    p_c = points[..., :3]
    p_h = se3.transform(T_hc, p_c)
    z = jnp.maximum(p_h[..., 2], min_height)
    x = jnp.floor(p_h[..., 0] + 0.5).astype(jnp.int32)
    y = jnp.floor(p_h[..., 1] + 0.5).astype(jnp.int32)
    ok = (
        (x >= 0) & (x < Wh) & (y >= 0) & (y < Hh)
        & jnp.isfinite(points[..., 2])
        & (z >= min_height) & (z <= max_height)
        & (points[..., 2] < max_distance)
    )
    idx = jnp.where(ok, y * Wh + x, Hh * Wh)  # overflow bucket for invalid
    zf = jnp.where(ok, z, 0.0).reshape(-1)
    idxf = idx.reshape(-1)
    n_cells = Hh * Wh
    counts = jnp.zeros(n_cells + 1, jnp.float32).at[idxf].add(ok.reshape(-1))
    zsum = jnp.zeros(n_cells + 1, jnp.float32).at[idxf].add(zf)
    if image is not None:
        col = image.astype(jnp.float32)
        col_ok = ok & (col > 0)
        csum = jnp.zeros(n_cells + 1, jnp.float32).at[idxf].add(jnp.where(col_ok, col, 0.0).reshape(-1))
        ccnt = jnp.zeros(n_cells + 1, jnp.float32).at[idxf].add(col_ok.reshape(-1))
    counts = counts[:n_cells].reshape(Hh, Wh)
    zsum = zsum[:n_cells].reshape(Hh, Wh)

    old_mean, old_n, old_col = hm[..., 0], hm[..., 1], hm[..., 2]
    n_new = old_n + counts
    mean = jnp.where(n_new > 0, (old_n * old_mean + zsum) / jnp.maximum(n_new, 1e-9), old_mean)
    if image is not None:
        csum = csum[:n_cells].reshape(Hh, Wh)
        ccnt = ccnt[:n_cells].reshape(Hh, Wh)
        ncol = old_n + ccnt
        colour = jnp.where(ccnt > 0, (old_n * old_col + csum) / jnp.maximum(ncol, 1e-9), old_col)
    else:
        colour = old_col
    return jnp.stack([mean, n_new, colour, jnp.zeros_like(mean)], axis=-1)


def vbo_from_heightmap(hm):
    """(u, v, height, 1) grid points; NaN height when empty
    (VboFromHeightMap, cu_heightmap.cu:70-87)."""
    Hh, Wh = hm.shape[:2]
    v, u = jnp.mgrid[0:Hh, 0:Wh].astype(jnp.float32)
    z = jnp.where(hm[..., 1] > 0, hm[..., 0], jnp.nan)
    return jnp.stack([u, v, z, jnp.ones_like(z)], axis=-1)


def vbo_world_from_heightmap(hm, T_wh):
    """World-frame grid points (VboWorldFromHeightMap, cu_heightmap.cu:91-110)."""
    Hh, Wh = hm.shape[:2]
    v, u = jnp.mgrid[0:Hh, 0:Wh].astype(jnp.float32)
    Ph = jnp.stack([u, v, hm[..., 0]], axis=-1)
    Pw = se3.transform(T_wh, Ph)
    return jnp.concatenate([Pw, jnp.ones((Hh, Wh, 1), jnp.float32)], axis=-1)


def colour_heightmap(hm):
    """uchar4 colour buffer, alpha=0 for cells seen < 2 times
    (ColourHeightMap, cu_heightmap.cu:114-131)."""
    c = jnp.clip(hm[..., 2], 0, 255).astype(jnp.uint8)
    a = jnp.where(hm[..., 1] < 2, 0, 255).astype(jnp.uint8)
    return jnp.stack([c, c, c, a], axis=-1)


def generate_world_vbo_and_image(hm, T_wh):
    """(GenerateWorldVboAndImageFromHeightmap, cu_heightmap.cu:135-155)."""
    vbo = vbo_world_from_heightmap(hm, T_wh)
    img = jnp.clip(hm[..., 2], 0, 255).astype(jnp.uint8)
    return vbo, img


def triangle_strip_index_buffer(w: int, h: int):
    """Serpentine triangle-strip index buffer for a (h, w) grid of vertices
    (GenerateTriangleStripIndexBuffer, src/cu_index_buffer.cu:12-33).
    Host-side numpy: this feeds mesh export, not device compute."""
    import numpy as np

    idx = []
    for y in range(h - 1):
        xs = range(w) if y % 2 == 0 else range(w - 1, -1, -1)
        for x in xs:
            idx.append(y * w + x)
            idx.append((y + 1) * w + x)
    return np.asarray(idx, np.uint32)


class HeightmapFusion:
    """Stateful wrapper composing the heightmap kernels with the
    world<->heightmap transform bookkeeping (extra/HeightmapFusion.h:12-214).

    Cells are ``cell_size`` world units; the grid origin is the world point
    mapped to cell (0, 0) by T_hw.
    """

    def __init__(self, width_units: float, height_units: float,
                 cell_size: float, T_hw=None):
        import jax.numpy as jnp
        import numpy as np

        self.cell_size = cell_size
        self.w = int(round(width_units / cell_size))
        self.h = int(round(height_units / cell_size))
        scale = 1.0 / cell_size
        S = np.diag([scale, scale, 1.0]).astype(np.float32)
        base = np.asarray(T_hw if T_hw is not None else se3.identity(), np.float32)
        self.T_hw = jnp.asarray(np.concatenate([S @ base[:, :3], S @ base[:, 3:]], 1))
        self.hm = init_heightmap(self.w, self.h)

    def fuse(self, points_world, image=None, min_height=-1e10, max_height=1e10,
             max_distance=1e10):
        """Bin world-frame points into the grid (HeightmapFusion::Fuse)."""
        self.hm = update_heightmap(self.hm, points_world, image, self.T_hw,
                                   min_height, max_height, max_distance)
        return self.hm

    def world_vbo(self):
        """World-frame vertex grid + colour image (GenerateWorldVboAndImage...)."""
        import numpy as np
        import jax.numpy as jnp

        R = np.asarray(self.T_hw)[:, :3]
        t = np.asarray(self.T_hw)[:, 3]
        Rinv = np.linalg.inv(R)
        T_wh = jnp.asarray(
            np.concatenate([Rinv, -(Rinv @ t)[:, None]], 1).astype(np.float32)
        )
        return generate_world_vbo_and_image(self.hm, T_wh)

    def save_mesh(self, path: str):
        """Triangle-strip mesh export (HeightmapFusion::SaveModel)."""
        import numpy as np

        from ..fusion.marching_cubes import save_ply

        vbo, img = self.world_vbo()
        verts = np.asarray(vbo)[..., :3].reshape(-1, 3)
        idx = triangle_strip_index_buffer(self.w, self.h)
        # triangle strip -> triangle soup
        tris = []
        for i in range(len(idx) - 2):
            a, b, c = idx[i], idx[i + 1], idx[i + 2]
            if a != b and b != c and a != c:
                tris.append((verts[a], verts[b], verts[c]))
        save_ply(path, np.asarray(tris, np.float32))
        return len(tris)
