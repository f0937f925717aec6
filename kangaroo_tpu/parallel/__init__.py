"""Multi-chip scaling: meshes, sharded ops, frame-parallel batching."""
from . import batch, mesh, sharding
