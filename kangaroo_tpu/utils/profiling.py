"""Profiling helpers.

TPU equivalent of the reference's CudaTimer-based instrumentation + memory
prints (SURVEY.md §5 tracing/profiling): thin wrappers over ``jax.profiler``
traces plus a device-memory report replacing the apps' cudaMemGetInfo prints
(stereo/main.cpp:30-31,189-190).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/kangaroo_trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> str:
    """Best-effort live-buffer summary per device."""
    lines = []
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**20
            limit = stats.get("bytes_limit", 0) / 2**20
            lines.append(f"{dev}: {used:.1f} MiB in use / {limit:.1f} MiB")
        else:
            lines.append(f"{dev}: memory stats unavailable")
    return "\n".join(lines)
