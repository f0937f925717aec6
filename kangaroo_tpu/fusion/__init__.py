"""Fusion stack: TSDF fuse, SDF raycasting, mesh extraction."""
from . import marching_cubes, raycast, sdf
