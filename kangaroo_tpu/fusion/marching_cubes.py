"""Host-side isosurface extraction and mesh export.

Capability-equivalent of the reference's host marching cubes + mesh saving
(include/kangaroo/MarchingCubes.h:43-262: vMarchCube, SaveMesh -> .ply). We
extract with marching tetrahedra (6 tets/cube sharing the main diagonal):
the case table is derivable and unambiguous, the mesh is watertight, at the
cost of ~2x triangles vs classic MC.

Two implementations with identical output:
  * a native C++ core (kangaroo_tpu/native/marching_tets.cpp) loaded via
    ctypes, compiled on demand with g++ — the production path;
  * a vectorized NumPy fallback used when no compiler is available, and as
    the golden model in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = None
_LIB_TRIED = False

# Same tetrahedral decomposition as the C++ (kTets)
_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]],
    np.int32,
)

# triangle emission table: for each 4-bit inside-code, list of edges (pairs of
# tet-vertex indices); mirrors the C++ switch. Winding is CONSISTENT (r5):
# every kTets entry is positively oriented (det > 0), and each case's
# triangles are ordered so normals point toward the val > iso side
# (verified per case against the linear interpolant's gradient — the
# original quad cases were uniformly reversed, leaving 47% of sphere
# normals inward).
_CASES = {
    1: [(0, 1), (0, 2), (0, 3)],
    14: [(0, 2), (0, 1), (0, 3)],
    2: [(1, 0), (1, 3), (1, 2)],
    13: [(1, 3), (1, 0), (1, 2)],
    4: [(2, 0), (2, 1), (2, 3)],
    11: [(2, 1), (2, 0), (2, 3)],
    8: [(3, 0), (3, 2), (3, 1)],
    7: [(3, 2), (3, 0), (3, 1)],
    3: [(0, 2), (1, 3), (1, 2), (0, 2), (0, 3), (1, 3)],
    12: [(1, 2), (1, 3), (0, 2), (1, 3), (0, 3), (0, 2)],
    5: [(0, 1), (2, 1), (2, 3), (0, 1), (2, 3), (0, 3)],
    10: [(2, 3), (2, 1), (0, 1), (0, 3), (2, 3), (0, 1)],
    6: [(1, 0), (2, 3), (2, 0), (1, 0), (1, 3), (2, 3)],
    9: [(2, 0), (2, 3), (1, 0), (2, 3), (1, 3), (1, 0)],
}


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(_NATIVE_DIR, "marching_tets.cpp")
    so = os.path.join(_NATIVE_DIR, "libmarching_tets.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.mt_extract.restype = ctypes.c_int64
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # vol
            ctypes.POINTER(ctypes.c_float),  # weight (nullable)
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # d h w
            ctypes.POINTER(ctypes.c_float),  # lo
            ctypes.POINTER(ctypes.c_float),  # hi
            ctypes.c_float,  # iso
            ctypes.c_float,  # wmin
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.mt_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _extract_numpy(vol, weight, lo, hi, iso, wmin):
    D, H, W = vol.shape
    sx = (hi[0] - lo[0]) / (W - 1)
    sy = (hi[1] - lo[1]) / (H - 1)
    sz = (hi[2] - lo[2]) / (D - 1)

    # gather cube corner values/positions for all cells: (Ncell, 8)
    z, y, x = np.mgrid[0 : D - 1, 0 : H - 1, 0 : W - 1]
    z, y, x = z.ravel(), y.ravel(), x.ravel()
    corners = np.array([(i & 1, (i >> 1) & 1, (i >> 2) & 1) for i in range(8)])
    cx = x[:, None] + corners[None, :, 0]
    cy = y[:, None] + corners[None, :, 1]
    cz = z[:, None] + corners[None, :, 2]
    cv = vol[cz, cy, cx]  # (N, 8)
    if weight is not None:
        valid = (weight[cz, cy, cx] > wmin).all(axis=1)
    else:
        valid = np.ones(len(cv), bool)
    px = lo[0] + sx * cx
    py = lo[1] + sy * cy
    pz = lo[2] + sz * cz
    cp = np.stack([px, py, pz], axis=-1)  # (N, 8, 3)

    tris = []
    for tet in _TETS:
        tv = cv[:, tet]  # (N, 4)
        tp = cp[:, tet]  # (N, 4, 3)
        code = ((tv < iso) << np.arange(4)).sum(axis=1)
        for c, edges in _CASES.items():
            sel = valid & (code == c)
            if not sel.any():
                continue
            v = tv[sel]
            p = tp[sel]
            pts = []
            for a, b in edges:
                t = (iso - v[:, a]) / (v[:, b] - v[:, a])
                t = np.clip(t, 0.0, 1.0)[:, None]
                pts.append(p[:, a] + t * (p[:, b] - p[:, a]))
            tri = np.stack(pts, axis=1).reshape(len(v), -1, 3, 3)
            tris.append(tri.reshape(-1, 3, 3))
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(tris, axis=0).astype(np.float32)


def extract_mesh(vol, iso=0.0, weight_min=0.0, use_native: bool | None = None):
    """Extract the isosurface of a TsdfVolume / BoundedVolume.

    Returns (ntri, 3, 3) float32 triangle soup in world units. TSDF weights
    gate empty voxels like the reference's GetSafe check (MarchingCubes.h).
    """
    from ..containers.volume import TsdfVolume

    if isinstance(vol, TsdfVolume):
        data = np.asarray(vol.val, np.float32)
        weight = np.asarray(vol.weight, np.float32)
    else:
        data = np.asarray(vol.data, np.float32)
        weight = None
    lo = np.asarray(vol.bbox.lo, np.float32)
    hi = np.asarray(vol.bbox.hi, np.float32)

    lib = _load_native() if use_native in (None, True) else None
    if use_native is True and lib is None:
        raise RuntimeError("native marching_tets unavailable")
    if lib is not None:
        data_c = np.ascontiguousarray(data)
        pf = ctypes.POINTER(ctypes.c_float)
        out = pf()
        wptr = (
            np.ascontiguousarray(weight).ctypes.data_as(pf) if weight is not None else pf()
        )
        d, h, w = data.shape
        n = lib.mt_extract(
            data_c.ctypes.data_as(pf), wptr, d, h, w,
            lo.ctypes.data_as(pf), hi.ctypes.data_as(pf),
            ctypes.c_float(iso), ctypes.c_float(weight_min), ctypes.byref(out),
        )
        tris = np.ctypeslib.as_array(out, shape=(n, 3, 3)).copy()
        lib.mt_free(out)
        return tris
    return _extract_numpy(data, weight, lo, hi, iso, weight_min)


def save_ply(path: str, tris: np.ndarray) -> None:
    """Write a triangle soup as binary PLY (SaveMesh, MarchingCubes.h:186-235
    writes .ply via ASSIMP; format-compatible output)."""
    verts = tris.reshape(-1, 3)
    nf = len(tris)
    with open(path, "wb") as f:
        f.write(
            (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(verts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {nf}\n"
                "property list uchar int vertex_indices\nend_header\n"
            ).encode()
        )
        f.write(verts.astype("<f4").tobytes())
        faces = np.empty(nf, dtype=[("n", "u1"), ("i", "<i4", 3)])
        faces["n"] = 3
        faces["i"] = np.arange(nf * 3, dtype=np.int32).reshape(nf, 3)
        f.write(faces.tobytes())


def load_ply(path: str):
    """Read back a PLY written by :func:`save_ply`."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        nv = int(next(l.split()[-1] for l in lines if l.startswith("element vertex")))
        nf = int(next(l.split()[-1] for l in lines if l.startswith("element face")))
        verts = np.frombuffer(f.read(nv * 12), "<f4").reshape(nv, 3)
        faces = np.frombuffer(f.read(nf * 13), dtype=[("n", "u1"), ("i", "<i4", 3)])
    return verts, faces["i"]


def save_vbo_ply(path: str, points, colors=None) -> None:
    """Export a point image / vertex grid as a PLY point cloud, optionally
    coloured (the role of extra/AssimpVboExport.h + SaveGIL). points is
    (..., 3|4); colors (..., 3) uint8."""
    pts = np.asarray(points, np.float32).reshape(-1, points.shape[-1])[:, :3]
    ok = np.isfinite(pts).all(axis=1)
    pts = pts[ok]
    cols = None
    if colors is not None:
        cols = np.asarray(colors).reshape(-1, colors.shape[-1])[:, :3][ok]
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(pts)}",
               "property float x", "property float y", "property float z"]
        if cols is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += ["end_header", ""]
        f.write("\n".join(hdr).encode())
        if cols is None:
            f.write(pts.astype("<f4").tobytes())
        else:
            rec = np.empty(len(pts), dtype=[("p", "<f4", 3), ("c", "u1", 3)])
            rec["p"] = pts
            rec["c"] = cols
            f.write(rec.tobytes())


def save_meshlab_project(path: str, mesh_files) -> None:
    """Write a minimal MeshLab project referencing exported meshes
    (extra/SaveMeshlab.h)."""
    layers = "\n".join(
        f'  <MLMesh label="{os.path.basename(m)}" filename="{m}">\n  </MLMesh>'
        for m in mesh_files
    )
    with open(path, "w") as f:
        f.write(
            "<!DOCTYPE MeshLabDocument>\n<MeshLabProject>\n <MeshGroup>\n"
            f"{layers}\n </MeshGroup>\n</MeshLabProject>\n"
        )
