"""Fusion stack: TSDF fuse, SDF raycasting, mesh extraction."""
from . import marching_cubes, marching_cubes256, raycast, sdf
