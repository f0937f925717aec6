"""Gauss-Newton normal-equation systems.

TPU-native equivalent of LeastSquaresSystem<P,N> (Mat.h:521-556) and its
shared-memory block reduction (LeastSquareSum.h:17-86). The CUDA design
tree-reduces 29-float structs per 16x16 block then thrust::reduce's partials;
on TPU the per-pixel Jacobians reduce with two matmuls that run on the MXU:

  JTJ = (w J)^T J      (N, M) @ (M, N)
  JTy = (w y J)^T 1    row sum

so the whole build-and-reduce fuses into one XLA computation.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LSS:
    """Normal equations JTJ x = JTy plus error stats (Mat.h:521-556)."""

    JTJ: jnp.ndarray  # (N, N)
    JTy: jnp.ndarray  # (N,)
    sqErr: jnp.ndarray  # ()
    obs: jnp.ndarray  # ()

    @classmethod
    def zero(cls, n: int) -> "LSS":
        return cls(
            jnp.zeros((n, n), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )

    def __add__(self, o: "LSS") -> "LSS":
        """Mergeable, like the reference's operator+ (Mat.h:548-556)."""
        return LSS(self.JTJ + o.JTJ, self.JTy + o.JTy, self.sqErr + o.sqErr, self.obs + o.obs)

    def rmse(self):
        """sqrt(sqErr / obs) — the tracking-quality gate
        (kinectfusion/main.cpp:316-321). Deliberately unguarded: obs == 0
        (zero valid correspondences, i.e. total tracking loss) must yield
        NaN like the reference's sqrt(0/0), so the app's auto-reset on
        non-finite rmse fires instead of reporting a perfect 0."""
        return jnp.sqrt(self.sqErr / self.obs)

    def solve(self, damping=0.0):
        """x = JTJ^-1 JTy. The reference does this on host with Eigen
        FullPivLU (kinectfusion/main.cpp:323-334); here it is a 6x6 solve
        on-device — via Cholesky, because JTJ is SPD and TPU lowers
        jnp.linalg.solve to a pivoted-LU custom call costing ~0.3 ms per
        tiny solve (6 chained solves in the ICP loop measured 1.7 ms; the
        Cholesky chain is below measurement resolution). A singular system
        yields NaNs, which the callers' isfinite guards already handle."""
        return solve_spd(self.JTJ, self.JTy, damping)


def solve_spd(A, b, damping=0.0):
    """Solve the SPD system (A + damping I) x = b by Cholesky.

    Replaces jnp.linalg.solve everywhere a Gauss-Newton normal matrix is
    solved: TPU lowers the general solve to a pivoted-LU custom call with
    ~0.3 ms latency per tiny matrix, while cholesky + two triangular
    solves compile to cheap on-device ops."""
    import jax.scipy.linalg as jsl

    A = A + damping * jnp.eye(A.shape[0], dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    return jsl.cho_solve((L, True), b)


def reduce_system(J, y, w, valid) -> LSS:
    """Reduce per-pixel rows into an LSS.

    J: (..., N) Jacobian rows, y: (...) residuals, w: (...) IRLS weights,
    valid: (...) boolean mask. Invalid rows contribute nothing (the CUDA
    kernels zero the thread-local system in their else branches).
    """
    n = J.shape[-1]
    Jf = J.reshape(-1, n)
    yf = y.reshape(-1)
    vf = valid.reshape(-1)
    wf = jnp.where(vf, w.reshape(-1), 0.0)
    # scrub NaNs from masked-out lanes so they cannot poison the matmul
    Jf = jnp.where(vf[:, None], Jf, 0.0)
    yf = jnp.where(vf, yf, 0.0)
    wJ = Jf * wf[:, None]
    JTJ = wJ.T @ Jf  # (N, M) @ (M, N) -> MXU
    JTy = wJ.T @ yf
    sqerr = jnp.sum(jnp.where(vf, yf * yf, 0.0))
    obs = jnp.sum(vf.astype(jnp.float32))
    return LSS(JTJ, JTy, sqerr, obs)
