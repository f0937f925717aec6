"""Geometry: depth tools, heightmaps, pose graphs, rectification."""
from . import depth, heightmap, pose_graph, rectify
