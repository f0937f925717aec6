"""Backend dispatch: Pallas TPU kernels vs portable XLA implementations.

Every hot op has two implementations with identical semantics: a portable
XLA version (runs anywhere, used by the CPU test mesh) and a Pallas TPU
kernel. Dispatch picks Pallas on TPU-class platforms when the shapes satisfy
the kernels' tiling constraints, else falls back to XLA.
"""
from __future__ import annotations

import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def on_tpu() -> bool:
    if os.environ.get("KANGAROO_FORCE_XLA"):
        return False
    try:
        return jax.devices()[0].platform in _TPU_PLATFORMS
    except RuntimeError:
        return False


def use_pallas(*shape_conditions: bool) -> bool:
    return on_tpu() and all(shape_conditions)
