"""Marching tetrahedra (native C++ vs NumPy), PLY IO, heightmap fusion."""
import jax.numpy as jnp
import numpy as np
import pytest

import kangaroo_tpu as kt
from kangaroo_tpu.core import se3
from kangaroo_tpu.fusion import marching_cubes as mc
from kangaroo_tpu.fusion import sdf as sdf_mod
from kangaroo_tpu.geometry import heightmap as hm_mod


def _sphere(res=24, r=0.7):
    bbox = kt.BoundingBox.create((-1, -1, -1), (1, 1, 1))
    vol = kt.TsdfVolume.create(res, res, res, bbox, trunc_dist=0.3)
    return sdf_mod.sdf_sphere(vol, (0.0, 0.0, 0.0), r)


class TestMarchingTets:
    def test_sphere_surface_radius(self):
        vol = _sphere()
        tris = mc.extract_mesh(vol, use_native=False)
        assert len(tris) > 100
        radii = np.linalg.norm(tris.reshape(-1, 3), axis=1)
        np.testing.assert_allclose(radii.mean(), 0.7, atol=0.02)
        assert radii.std() < 0.03

    def test_native_matches_numpy(self):
        vol = _sphere(16)
        t_np = mc.extract_mesh(vol, use_native=False)
        try:
            t_cc = mc.extract_mesh(vol, use_native=True)
        except RuntimeError:
            pytest.skip("no g++ available")
        assert len(t_cc) == len(t_np)
        np.testing.assert_allclose(
            np.sort(t_cc.reshape(-1, 3), axis=0),
            np.sort(t_np.reshape(-1, 3), axis=0),
            atol=1e-5,
        )

    def test_weight_gating(self):
        vol = _sphere(16)
        vol = kt.TsdfVolume(vol.val, jnp.zeros_like(vol.weight), vol.bbox)
        tris = mc.extract_mesh(vol, use_native=False)
        assert len(tris) == 0

    def test_ply_roundtrip(self, tmp_path):
        vol = _sphere(12)
        tris = mc.extract_mesh(vol, use_native=False)
        p = str(tmp_path / "mesh.ply")
        mc.save_ply(p, tris)
        verts, faces = mc.load_ply(p)
        assert len(faces) == len(tris)
        np.testing.assert_allclose(verts.reshape(-1, 3, 3), tris, atol=1e-6)


class TestHeightmap:
    def test_update_running_mean(self):
        hm = hm_mod.init_heightmap(8, 8)
        # two points landing in cell (2, 3) with heights 1.0 and 3.0
        pts = jnp.array(
            [[[3.0, 2.0, 1.0, 1.0], [3.1, 2.1, 3.0, 1.0]]], jnp.float32
        )
        img = jnp.full((1, 2), 100, jnp.uint8)
        T_hc = se3.identity()
        hm2 = hm_mod.update_heightmap(hm, pts, img, T_hc)
        cell = np.asarray(hm2)[2, 3]
        assert cell[1] == 2.0
        assert cell[0] == pytest.approx(2.0)  # mean of 1 and 3
        assert cell[2] == pytest.approx((0 * 128 + 200) / 2.0)

    def test_vbo_and_colour(self):
        hm = hm_mod.init_heightmap(4, 4)
        pts = jnp.array([[[1.0, 1.0, 2.0, 1.0]]], jnp.float32)
        hm = hm_mod.update_heightmap(hm, pts, None, se3.identity())
        vbo = np.asarray(hm_mod.vbo_from_heightmap(hm))
        assert vbo[1, 1, 2] == pytest.approx(2.0)
        assert np.isnan(vbo[0, 0, 2])
        cbo = np.asarray(hm_mod.colour_heightmap(hm))
        assert cbo[1, 1, 3] == 0  # seen < 2 times -> transparent
        world = np.asarray(hm_mod.vbo_world_from_heightmap(hm, se3.identity()))
        assert world[1, 1, 2] == pytest.approx(2.0)

    def test_index_buffer(self):
        idx = hm_mod.triangle_strip_index_buffer(3, 2)
        assert idx.tolist() == [0, 3, 1, 4, 2, 5]
