"""kangaroo_tpu — a TPU-native dense computer-vision framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the CUDA
reference library arpg/Kangaroo (namespace ``roo``): HBM-resident image /
volume containers, a fused kernel library for filtering, stereo, variational
solvers and TSDF fusion / raycasting / ICP, and end-to-end stereo and
KinectFusion application drivers, scaling over TPU meshes with
``jax.sharding``.

This module mirrors the umbrella header include/kangaroo/kangaroo.h:1-45 by
re-exporting the public API.
"""

from .containers.bbox import BoundingBox, fit_to_frustum
from .containers.intrinsics import Intrinsics, level_from_max_pixels
from .containers.volume import BoundedVolume, TsdfVolume
from .containers import pyramid
from .core import invalid, patch_score, reweighting, sampling, se3
from .ops import convert, elementwise, resample

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy subpackage access: kangaroo_tpu.stereo, .fusion, .variational,
    .geometry, .solvers, .parallel, .apps, .ops, .io, .utils."""
    import importlib

    if name in {"stereo", "fusion", "variational", "geometry", "solvers",
                "parallel", "apps", "ops", "io", "utils", "backend", "roo"}:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)

__all__ = [
    "BoundingBox",
    "BoundedVolume",
    "Intrinsics",
    "TsdfVolume",
    "convert",
    "elementwise",
    "fit_to_frustum",
    "invalid",
    "level_from_max_pixels",
    "pyramid",
    "resample",
    "reweighting",
    "sampling",
    "se3",
]
