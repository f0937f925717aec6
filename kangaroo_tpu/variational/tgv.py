"""Second-order TGV-L1 primal-dual denoising.

TPU-native equivalent of src/cu_tgv.cu: the reference's
TGV_L1_DenoisingIteration is five kernel launches (AscentP, AscentQ, AscentR,
DescentU, DescentV, cu_tgv.cu:99-116); here one iteration is a pure function
over the state pytree and the full solve runs on-chip under lax.fori_loop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import ops


class TgvState(NamedTuple):
    u: jnp.ndarray  # (H, W) primal
    v: jnp.ndarray  # (H, W, 2) primal vector field
    p: jnp.ndarray  # (H, W, 2) dual of grad u - v
    q: jnp.ndarray  # (H, W, 3) dual of Epsilon(v)
    r: jnp.ndarray  # (H, W) data dual


def init(f) -> TgvState:
    H, W = f.shape
    return TgvState(
        u=f,
        v=jnp.zeros((H, W, 2), f.dtype),
        p=jnp.zeros((H, W, 2), f.dtype),
        q=jnp.zeros((H, W, 3), f.dtype),
        r=jnp.zeros((H, W), f.dtype),
    )


def iteration(s: TgvState, f, alpha0, alpha1, sigma, tau, delta) -> TgvState:
    """One TGV-L1 primal-dual iteration (TGV_L1_DenoisingIteration,
    cu_tgv.cu:99-116). The reference runs the five half-steps sequentially with
    each reading the previous launches' writes; order preserved here."""
    # AscentP (cu_tgv.cu:37-52)
    p = ops.project_unit_ball(s.p + sigma * alpha1 * (ops.grad_forward(s.u) - s.v))
    # AscentQ (cu_tgv.cu:54-65)
    q = ops.project_unit_ball_sym(s.q + sigma * alpha0 * ops.epsilon(s.v))
    # AscentR (cu_tgv.cu:67-79)
    r = ops.project_unit_ball_scalar((s.r + sigma * (s.u - f)) / (1.0 + sigma * delta))
    # DescentU (cu_tgv.cu:8-20)
    u = s.u - tau * (r - alpha1 * ops.divergence(p))
    # DescentV (cu_tgv.cu:22-35)
    v = s.v - tau * (-alpha1 * p - alpha0 * ops.divergence_sym(q))
    return TgvState(u, v, p, q, r)


def denoise(f, alpha0=2.0, alpha1=1.0, sigma=0.5, tau=0.25, delta=0.1,
            iterations: int = 100):
    """Full TGV-L1 denoise on-chip (examples/Denoising.cpp host loop). On
    TPU all 9 field planes stay VMEM-resident across every iteration in one
    Pallas kernel (pallas_solvers.tgv_denoise)."""
    from .. import backend
    from . import pallas_solvers as ps

    if backend.use_pallas(ps.tileable(f.shape)):
        return ps.tgv_denoise(f, alpha0, alpha1, sigma, tau, delta, iterations)
    return _denoise_xla(f, alpha0, alpha1, sigma, tau, delta, iterations)


@functools.partial(jax.jit, static_argnames=("iterations",))
def _denoise_xla(f, alpha0=2.0, alpha1=1.0, sigma=0.5, tau=0.25, delta=0.1,
                 iterations: int = 100):
    s0 = init(f)

    def body(_, s):
        return iteration(s, f, alpha0, alpha1, sigma, tau, delta)

    s = jax.lax.fori_loop(0, iterations, body, s0)
    return s.u
