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

    def test_consistent_outward_winding(self):
        """Every triangle's normal points toward val > iso (away from the
        solid): the r5 fix — the quad cases of the tet table were
        uniformly reversed, leaving ~half the sphere's normals inward."""
        vol = _sphere()
        tris = mc.extract_mesh(vol, use_native=False)
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        dots = (n * tris.mean(1)).sum(1)
        area2 = np.linalg.norm(n, axis=1)
        assert (dots[area2 > 1e-12] > 0).all()

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


class TestMarchingCubes256:
    """Classic 256-case MC with the freshly DERIVED table
    (fusion/marching_cubes256.py; mesh-level parity option vs the
    reference's vMarchCube, MarchingCubes.h:43-144)."""

    def test_table_derivation_invariants(self):
        from kangaroo_tpu.fusion import marching_cubes256 as mc256

        tt = mc256._TRI_TABLE
        assert len(tt) == 256
        assert not tt[0] and not tt[255]
        # every non-trivial case triangulates, using only sign-change edges
        for case in range(1, 255):
            assert tt[case] and len(tt[case]) % 3 == 0
            inside = [(case >> i) & 1 for i in range(8)]
            for e in tt[case]:
                a, b = mc256._EDGES[e]
                assert inside[a] != inside[b], (case, e)
        # single-corner cases are one triangle; the classic table never
        # exceeds 5 triangles
        assert len(tt[1]) == 3 and len(tt[128]) == 3
        assert mc256._MAX_TRIS <= 5

    def test_sphere_watertight_oriented_accurate(self):
        """The derived table's construction guarantees: closed surface
        (every vertex-welded edge shared by exactly 2 triangles), outward
        winding (normals along the SDF gradient), correct radius, ~1/3 the
        tet mesher's triangle count."""
        from kangaroo_tpu.fusion import marching_cubes256 as mc256

        vol = _sphere()
        tris = mc256.extract_mesh(vol, use_native=False)
        tet = mc.extract_mesh(vol, use_native=False)
        assert 0.2 * len(tet) < len(tris) < 0.5 * len(tet)
        radii = np.linalg.norm(tris.reshape(-1, 3), axis=1)
        np.testing.assert_allclose(radii.mean(), 0.7, atol=0.02)
        # watertight: weld vertices, count edge incidence
        v = tris.reshape(-1, 3)
        _, inv = np.unique(np.round(v * 1e6).astype(np.int64), axis=0,
                           return_inverse=True)
        f = inv.reshape(-1, 3)
        e = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, cnt = np.unique(e, axis=0, return_counts=True)
        assert (cnt == 2).all()
        # winding: normal . outward-radial > 0 for every triangle
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        assert ((n * tris.mean(1)).sum(1) > 0).all()

    def test_hausdorff_vs_marching_tets(self):
        """The two meshers triangulate the same isosurface: symmetric
        vertex-to-surface distance well under a voxel (VERDICT r4 #9)."""
        from kangaroo_tpu.fusion import marching_cubes256 as mc256

        vol = _sphere(14)
        a = mc256.extract_mesh(vol, use_native=False)
        b = mc.extract_mesh(vol, use_native=False)
        voxel = 2.0 / 13

        def surf(tris, n=3):
            # barycentric n(n+1)/2-point sampling of every triangle, so the
            # point sets approximate the SURFACES (vertex-to-vertex alone
            # overstates: tet vertices sit on face diagonals, between MC's
            # edge vertices)
            pts = []
            for i in range(n + 1):
                for j in range(n + 1 - i):
                    u, v = i / n, j / n
                    pts.append(tris[:, 0] * (1 - u - v) + tris[:, 1] * u
                               + tris[:, 2] * v)
            return np.concatenate(pts).astype(np.float32)

        pa, pb = surf(a), surf(b)

        def d(p, q):
            out = np.empty(len(p), np.float32)
            for i in range(0, len(p), 1024):
                blk = p[i:i + 1024]
                d2 = ((blk[:, None] - q[None]) ** 2).sum(-1)
                out[i:i + 1024] = d2.min(1)
            return float(np.sqrt(out.max()))
        assert d(pa, pb) < 0.3 * voxel and d(pb, pa) < 0.3 * voxel

    def test_native_bit_identical_to_numpy(self):
        from kangaroo_tpu.fusion import marching_cubes256 as mc256

        rng = np.random.default_rng(3)
        data = rng.standard_normal((14, 12, 16)).astype(np.float32)
        k = np.ones(5, np.float32) / 5
        for ax in range(3):
            data = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), ax, data)
        vol = kt.BoundedVolume(jnp.asarray(data),
                               kt.BoundingBox.create((-1, -1, -1), (1, 1, 1)))
        t_np = mc256.extract_mesh(vol, use_native=False).reshape(-1, 9)
        try:
            t_cc = mc256.extract_mesh(vol, use_native=True).reshape(-1, 9)
        except RuntimeError:
            pytest.skip("no g++ available")
        canon = lambda x: x[np.lexsort(x.T[::-1])]
        assert np.array_equal(canon(t_np), canon(t_cc))

    def test_weight_gating(self):
        from kangaroo_tpu.fusion import marching_cubes256 as mc256

        vol = _sphere(16)
        vol = kt.TsdfVolume(vol.val, jnp.zeros_like(vol.weight), vol.bbox)
        assert len(mc256.extract_mesh(vol, use_native=False)) == 0


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
