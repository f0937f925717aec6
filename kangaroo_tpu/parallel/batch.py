"""Frame-parallel (data-parallel) execution over the mesh.

SURVEY.md §2.4: the DCN/ICI frame-parallel axis — independent frames sharded
across chips, the trivial-scaling mode for offline throughput runs. Each
device runs the full single-chip pipeline on its shard of the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

AXIS = "shard"


def frame_parallel(fn, mesh, n_outputs: int = 1):
    """Lift ``fn(*frame_args) -> out`` to a batch with the leading axis
    sharded across the mesh: each device vmaps fn over its local frames.

    Example:
        f = frame_parallel(lambda l, r: sgm_pipeline(l, r, cfg), mesh)
        disp_batch = f(left_batch, right_batch)   # (B, H, W), B % n_dev == 0
    """

    def local(*args):
        return jax.vmap(fn)(*args)

    in_specs = None  # filled per call

    def wrapper(*args):
        specs = tuple(P(AXIS, *([None] * (a.ndim - 1))) for a in args)
        out_spec = P(AXIS)  # leading batch axis stays sharded
        f = shard_map(
            local, mesh=mesh, in_specs=specs,
            out_specs=out_spec if n_outputs == 1 else (out_spec,) * n_outputs,
            check_vma=False,
        )
        return f(*args)

    return wrapper
