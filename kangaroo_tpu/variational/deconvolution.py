"""TV-regularised deconvolution (primal-dual).

TPU-native equivalent of src/cu_deconvolution.cu combined with the
Convolution op, mirroring the Deconvolution example's iteration
(applications/examples/Deconvolution.cpp:95-100):

  p   <- HuberDualAscent(p, u)
  Au  <- k * u
  q   <- (q + sigma_q (Au - g)) / (1 + sigma_q / lambda)
  ATq <- k^T * q
  u   <- u + tau (div p - lambda ATq)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.convolution import convolve
from . import ops, rof


def dual_q_ascent(q, Au, g, sigma_q, lam):
    """(DeconvolutionDual_qAscent, cu_deconvolution.cu:13-36)."""
    return (q + sigma_q * (Au - g)) / (1.0 + sigma_q / lam)


def primal_u_descent(u, p, ATq, tau, lam):
    """(Deconvolution_uDescent, cu_deconvolution.cu:42-66)."""
    return u + tau * (ops.divergence(p) - lam * ATq)


@functools.partial(jax.jit, static_argnames=("iterations",))
def deconvolve(g, kernel, lam=10.0, sigma_q=0.2, sigma_p=0.2, tau=0.05,
               alpha=0.002, iterations: int = 200):
    """Recover u from blurry g with blur kernel ``kernel``."""
    kernel = jnp.asarray(kernel, jnp.float32)
    kT = kernel[::-1, ::-1]
    u0 = g
    p0 = jnp.zeros(g.shape + (2,), g.dtype)
    q0 = jnp.zeros_like(g)

    def body(_, carry):
        u, p, q = carry
        p = rof.huber_dual_ascent_p(p, u, sigma_p, alpha)
        Au = convolve(u, kernel, normalize=True)
        q = dual_q_ascent(q, Au, g, sigma_q, lam)
        ATq = convolve(q, kT, normalize=True)
        u = primal_u_descent(u, p, ATq, tau, lam)
        return (u, p, q)

    u, _, _ = jax.lax.fori_loop(0, iterations, body, (u0, p0, q0))
    return u


def inpaint(g, mask, lam=10.0, sigma=0.5, tau=0.25, alpha=0.002,
            iterations: int = 300):
    """TV inpainting: denoising with pixelwise lambda = lam * mask
    (InpaintingUsingDenoising example; uses the pixelwise-lambda primal
    descent overload, cu_rof_denoising.cu:177-205). mask is 1 where data is
    trusted, 0 where it must be filled. On TPU the whole solve runs in the
    VMEM-resident ROF kernel (pallas_solvers)."""
    from .. import backend
    from . import pallas_solvers as ps

    if backend.use_pallas(ps.tileable(g.shape)):
        return ps.rof_denoise(g, lam, sigma, tau, alpha, iterations, "huber",
                              lam_weight=mask)
    return _inpaint_xla(g, mask, lam, sigma, tau, alpha, iterations)


@functools.partial(jax.jit, static_argnames=("iterations",))
def _inpaint_xla(g, mask, lam=10.0, sigma=0.5, tau=0.25, alpha=0.002,
                 iterations: int = 300):
    u0 = g
    p0 = jnp.zeros(g.shape + (2,), g.dtype)
    lamw = mask.astype(g.dtype)

    def body(_, carry):
        u, p = carry
        p = rof.huber_dual_ascent_p(p, u, sigma, alpha)
        u = rof.l2_primal_descent(u, p, g, tau, lam, lambda_weight=lamw)
        return (u, p)

    u, _ = jax.lax.fori_loop(0, iterations, body, (u0, p0))
    return u
