"""Device timing utilities.

Equivalent of the reference's CudaTimer (include/kangaroo/CudaTimer.h:16-153)
adapted to remote-TPU realities: host<->device syncs cost tens of ms through
the tunnel and `block_until_ready` is unreliable, so wall-clock timing of a
single call is meaningless. :func:`time_fn` therefore repeats the op N times
*inside one jitted computation* (a fori_loop whose carry forces a data
dependency between iterations) and reports the slope between an N-iteration
and a 1-iteration run — pure device time, independent of sync latency.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    _ = float(jnp.asarray(leaves[0]).ravel().astype(jnp.float32)[0])


def _repeat_jit(fn, n: int, reduce_outputs: bool = False):
    """Jitted: run fn n times with a data dependency chaining iterations.

    The default chain reads ONE scalar per output leaf — free, but it only
    keeps ops alive that feed that scalar. An output stacked from
    INDEPENDENT subgraphs (e.g. ``jnp.stack([pipeline(x[k]) for k in ...])``)
    gets all but one subgraph dead-code-eliminated INSIDE the repeat loop,
    silently reporting ~1/B of the real cost (found by xplane-tracing the
    while body: 4 aggregate kernels per iteration instead of 16).
    ``reduce_outputs=True`` sums every output element instead — a full
    read of each output per iteration (~0.1 ms per 64 MB at HBM speed),
    which keeps every subgraph live; use it when timing batched or
    multi-branch programs."""

    def mix(carry_args, out):
        leaves = jax.tree_util.tree_leaves(out)
        s = jnp.float32(0)
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            if reduce_outputs:
                v = jnp.sum(leaf.astype(jnp.float32))
                # NaN-proof: invalid pixels are NaN by convention
                s = s + jnp.where(jnp.isfinite(v), v, jnp.float32(0))
            else:
                s = s + leaf.ravel()[0].astype(jnp.float32)
        a0 = carry_args[0]
        eps = (s * 1e-30).astype(a0.dtype) if jnp.issubdtype(a0.dtype, jnp.floating) else (
            (s * 1e-30).astype(jnp.float32).astype(a0.dtype)
        )
        a0 = a0 + eps
        return (a0,) + tuple(carry_args[1:])

    @jax.jit
    def g(*args):
        def body(i, carry):
            out = fn(*carry)
            return mix(carry, out)

        carry = jax.lax.fori_loop(0, n, body, tuple(args))
        return fn(*carry)

    return g


def time_fn(fn, *args, iters: int = 16, warmup: int = 1, chain_arg=None,
            samples: int = 3, reduce_outputs: bool = False):
    """Seconds per call of ``fn(*args)``, measured device-side via the slope
    between (iters+1)-repetition and 1-repetition jitted runs.

    Pass ``reduce_outputs=True`` when fn's output stacks INDEPENDENT
    subgraphs (see _repeat_jit: the default one-scalar chain lets XLA
    dead-code-eliminate the other branches inside the repeat loop)."""
    del chain_arg, warmup  # legacy signature
    g1 = _repeat_jit(fn, 0, reduce_outputs)
    gn = _repeat_jit(fn, iters, reduce_outputs)
    out = g1(*args)
    _sync(out)
    out = gn(*args)
    _sync(out)

    def best_time(g):
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            out = g(*args)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(g1)
    tn = best_time(gn)
    return max(tn - t1, 1e-9) / iters


def time_fn_stats(fn, *args, iters: int = 16, k: int = 3,
                  reduce_outputs: bool = False):
    """``k`` independent slope measurements of ``fn(*args)`` (one compile,
    k measurement passes): returns ``{"median", "min", "max"}`` seconds per
    call. The single-sample ``time_fn`` spread on this chip is ~±20 %
    run-to-run (docs/PERF.md); benchmark artifacts report the median with
    the observed min/max so round-over-round deltas are falsifiable."""
    g1 = _repeat_jit(fn, 0, reduce_outputs)
    gn = _repeat_jit(fn, iters, reduce_outputs)
    _sync(g1(*args))
    _sync(gn(*args))

    def best_time(g, samples=3):
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            _sync(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    ts = []
    for _ in range(k):
        t1 = best_time(g1)
        tn = best_time(gn)
        ts.append(max(tn - t1, 1e-9) / iters)
    ts.sort()
    return {"median": ts[len(ts) // 2], "min": ts[0], "max": ts[-1]}


class Timer:
    """Running avg/min/max timer (CudaTimer.h Start/Stop/PrintSummary)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            _sync(sync_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def avg(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def min(self):
        return min(self.times) if self.times else 0.0

    @property
    def max(self):
        return max(self.times) if self.times else 0.0

    def print_summary(self):
        print(
            f"{self.name}: avg {1e3 * self.avg:.3f} ms, "
            f"min {1e3 * self.min:.3f} ms, max {1e3 * self.max:.3f} ms "
            f"({len(self.times)} samples)"
        )
