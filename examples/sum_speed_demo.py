"""Normal-equation reduction micro-benchmark.

Offline equivalent of applications/examples/CudaSumSpeed.cpp:26-35, which
times the LeastSquaresSystem<float,6> block reduction (SumSpeedTest,
cu_model_refinement.cu:708-733). Here the reduction is two MXU matmuls; the
timer is the device-pure slope harness.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _common  # noqa: F401  (sys.path setup)

import jax.numpy as jnp
import numpy as np


def main():
    from kangaroo_tpu.solvers.lss import reduce_system
    from kangaroo_tpu.utils.timing import time_fn

    H, W = 480, 640
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.normal(size=(H, W, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    w = jnp.asarray(rng.random((H, W)).astype(np.float32))
    valid = jnp.asarray(rng.random((H, W)) > 0.1)

    f = lambda J, y, w, v: reduce_system(J, y, w, v).JTJ
    dt = time_fn(f, J, y, w, valid, iters=2000)
    n = H * W
    print(f"LSS<float,6> reduction over {n} obs: {1e3 * dt:.3f} ms "
          f"({n / dt / 1e9:.2f} Gobs/s)")
    s = reduce_system(J, y, w, valid)
    print(f"obs={float(s.obs):.0f} rmse={float(s.rmse()):.4f}")


if __name__ == "__main__":
    main()
