"""Pallas TPU median filters.

The reference's exchange-network medians (src/cu_median.cu:42-352) map
naturally to the VPU: the (2r+1)^2 window values are full-image planes in
VMEM and a Batcher odd-even mergesort network runs min/max compare-exchanges
over whole planes — the same algorithmic idea as the CUDA bitonic networks,
vectorised across the entire image instead of per-thread registers.

Matches ops.median.median_filter_reject_invalid / median_filter exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _batcher_pairs(n: int):
    """Compare-exchange pairs of Batcher's odd-even mergesort for n elements."""
    pairs = []

    def merge(lo, cnt, r):
        step = r * 2
        if step < cnt:
            merge(lo, cnt, step)
            merge(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, cnt):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, cnt - m)
            merge_po2(lo, cnt, 1)

    # classic power-of-two construction on the next pow2, pruned to < n
    def merge_po2(lo, cnt, r):
        step = r * 2
        if step < cnt:
            merge_po2(lo, cnt, step)
            merge_po2(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                if i + r < n:
                    pairs.append((i, i + r))
        else:
            if lo + r < n:
                pairs.append((lo, lo + r))

    m = 1
    while m < n:
        m *= 2

    def sort_po2(lo, cnt):
        if cnt > 1:
            half = cnt // 2
            sort_po2(lo, half)
            sort_po2(lo + half, half)
            merge_po2(lo, cnt, 1)

    sort_po2(0, m)
    return [(a, b) for (a, b) in pairs if a < n and b < n]


def _median_kernel(padded_ref, out_ref, *, H, W, rad, max_bad, reject):
    k = (2 * rad + 1) ** 2
    vals = []
    for dy in range(2 * rad + 1):
        for dx in range(2 * rad + 1):
            vals.append(padded_ref[dy : dy + H, dx : dx + W])

    if reject:
        bad = jnp.zeros((H, W), jnp.int32)
        clean = []
        for v in vals:
            isbad = ~jnp.isfinite(v)
            bad = bad + isbad.astype(jnp.int32)
            clean.append(jnp.where(isbad, jnp.inf, v))
        vals = clean

    for a, b in _batcher_pairs(k):
        lo = jnp.minimum(vals[a], vals[b])
        hi = jnp.maximum(vals[a], vals[b])
        vals[a], vals[b] = lo, hi

    if reject:
        idx = jnp.minimum((k + bad) // 2, k - 1)
        med = jnp.zeros((H, W), jnp.float32)
        for i in range(k):
            med = jnp.where(idx == i, vals[i], med)
        ok = (bad < max_bad) & (bad < k)
        out_ref[:] = jnp.where(ok, med, jnp.nan)
    else:
        out_ref[:] = vals[k // 2]


@functools.partial(jax.jit, static_argnames=("max_bad", "rad", "reject"))
def median_filter(img, max_bad: int = 0, rad: int = 2, reject: bool = True):
    """Pallas median; ``reject`` selects the invalid-ignoring variant."""
    H, W = img.shape
    padded = jnp.pad(img.astype(jnp.float32), rad, mode="edge")
    return pl.pallas_call(
        functools.partial(
            _median_kernel, H=H, W=W, rad=rad, max_bad=max_bad, reject=reject
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(padded)
