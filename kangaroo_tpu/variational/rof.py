"""ROF / Huber-ROF primal-dual denoising (Chambolle-Pock).

TPU-native equivalent of src/cu_rof_denoising.cu: the dual ascent steps
(TV-L1, Huber, weighted Huber) and primal descent steps (L2 data term,
pixelwise-lambda, edge-weighted). The reference launches one kernel per
half-step from a host loop; here each half-step is a pure function, and
:func:`denoise` runs the whole solve on-chip in a single ``lax.fori_loop`` —
the fused-iteration design SURVEY.md §3.5 calls for.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ops


def tvl1_dual_ascent_p(p, u, sigma):
    """p <- Pi(p + sigma grad u) (TVL1GradU_DualAscentP,
    cu_rof_denoising.cu:37-69)."""
    return ops.project_unit_ball(p + sigma * ops.grad_forward(u))


def huber_dual_ascent_p(p, u, sigma, alpha):
    """Huber prox: divide by (1 + sigma*alpha) before projection
    (HuberGradU_DualAscentP, cu_rof_denoising.cu:75-108)."""
    np_ = (p + sigma * ops.grad_forward(u)) / (1.0 + sigma * alpha)
    return ops.project_unit_ball(np_)


def weighted_huber_dual_ascent_p(p, u, w, sigma, alpha):
    """Edge-weighted Huber dual ascent (WeightedHuberGradU_DualAscentP,
    cu_rof_denoising.cu:114-141)."""
    np_ = (p + sigma * w[..., None] * ops.grad_forward(u)) / (1.0 + sigma * alpha)
    return ops.project_unit_ball(np_)


def l2_primal_descent(u, p, g, tau, lam, lambda_weight=None):
    """u <- (u + tau (div p + lambda g)) / (1 + tau lambda)
    (L2_u_minus_g_PrimalDescent, cu_rof_denoising.cu:147-205)."""
    if lambda_weight is not None:
        lam = lam * lambda_weight
    divp = ops.divergence(p)
    return (u + tau * (divp + lam * g)) / (1.0 + tau * lam)


def weighted_l2_primal_descent(u, p, g, w, tau, lam):
    """Edge-weighted primal descent: u <- (u + tau (w div p + lambda g)) /
    (1 + tau lambda) (WeightedL2_u_minus_g_PrimalDescent,
    cu_rof_denoising.cu:211-236)."""
    divp = ops.divergence(p)
    return (u + tau * (w * divp + lam * g)) / (1.0 + tau * lam)


def denoise(g, lam, sigma=0.5, tau=0.25, alpha=0.002, iterations: int = 100,
            model: str = "huber"):
    """Full ROF solve on-chip. model in {'tv', 'huber'}.

    Mirrors the Denoising example's host loop (examples/Denoising.cpp). On
    TPU the whole solve runs inside one Pallas kernel with the primal-dual
    state resident in VMEM (pallas_solvers.rof_denoise — the XLA fori_loop
    streams every field through HBM each iteration); elsewhere it is a
    lax.fori_loop in one XLA computation.
    """
    from .. import backend
    from . import pallas_solvers as ps

    if backend.use_pallas(ps.tileable(g.shape)):
        return ps.rof_denoise(g, lam, sigma, tau, alpha, iterations, model)
    return _denoise_xla(g, lam, sigma, tau, alpha, iterations, model)


@functools.partial(jax.jit, static_argnames=("iterations", "model"))
def _denoise_xla(g, lam, sigma=0.5, tau=0.25, alpha=0.002,
                 iterations: int = 100, model: str = "huber"):
    u0 = g
    p0 = jnp.zeros(g.shape + (2,), g.dtype)

    def body(_, carry):
        u, p = carry
        if model == "tv":
            p = tvl1_dual_ascent_p(p, u, sigma)
        else:
            p = huber_dual_ascent_p(p, u, sigma, alpha)
        u = l2_primal_descent(u, p, g, tau, lam)
        return (u, p)

    u, _ = jax.lax.fori_loop(0, iterations, body, (u0, p0))
    return u
