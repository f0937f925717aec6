"""In-VMEM Pallas solvers for the variational stack.

The XLA fori_loop solvers (rof.py, tgv.py) stream every field through HBM
once per iteration (~30 MB/iter for TGV at VGA — measured HBM-bound at
~49 us/iter). All fields for a VGA solve total ~14 MB, which fits in VMEM,
so these kernels hold the whole primal-dual state in VMEM scratch and run
every iteration on-chip: zero HBM traffic between iterations, one read of
the input and one write of the result overall.

Arithmetic mirrors rof.iteration / tgv.iteration op for op (same order,
same boundary conventions) so interpret-mode results match the XLA path
(tests/test_variational_pallas.py). Shifts are pltpu.roll with wrapped
lanes masked by broadcasted_iota (Divergence.h boundary semantics: forward
gradient zero at the far edge, backward divergence dropping the
out-of-range term at the near edge).

Dispatched from rof.denoise / tgv.denoise when backend.use_pallas() and
the shape is TPU-tileable ((8, 128) multiples).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _masks(H, W):
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return row, col


def _dx_fwd(u, col, W):
    """u[:, x+1] - u[:, x], zero at the last column (GradUFwd)."""
    nxt = pltpu.roll(u, W - 1, axis=1)
    return jnp.where(col < W - 1, nxt - u, 0.0)


def _dy_fwd(u, row, H):
    nxt = pltpu.roll(u, H - 1, axis=0)
    return jnp.where(row < H - 1, nxt - u, 0.0)


def _div(px, py, row, col):
    """Backward-difference divergence (DivA): px + py minus the previous
    entries where they exist."""
    prev_x = jnp.where(col > 0, pltpu.roll(px, 1, axis=1), 0.0)
    prev_y = jnp.where(row > 0, pltpu.roll(py, 1, axis=0), 0.0)
    return px - prev_x + py - prev_y


def _make_rof_kernel(H, W, iterations, model, with_lamw: bool):
    def kernel(params_ref, g_ref, *rest):
        lam, sigma, tau, alpha = (params_ref[0], params_ref[1],
                                  params_ref[2], params_ref[3])
        if with_lamw:
            lamw_ref, out_ref = rest
            lam_px = lam * lamw_ref[:]
        else:
            (out_ref,) = rest
            lam_px = lam
        g = g_ref[:]
        row, col = _masks(H, W)

        def body(_, carry):
            u, p0, p1 = carry
            gx = _dx_fwd(u, col, W)
            gy = _dy_fwd(u, row, H)
            if model == "tv":
                n0 = p0 + sigma * gx
                n1 = p1 + sigma * gy
            else:
                n0 = (p0 + sigma * gx) / (1.0 + sigma * alpha)
                n1 = (p1 + sigma * gy) / (1.0 + sigma * alpha)
            den = jnp.maximum(1.0, jnp.sqrt(n0 * n0 + n1 * n1))
            p0 = n0 / den
            p1 = n1 / den
            divp = _div(p0, p1, row, col)
            u = (u + tau * (divp + lam_px * g)) / (1.0 + tau * lam_px)
            return u, p0, p1

        zero = jnp.zeros((H, W), jnp.float32)
        u, _, _ = jax.lax.fori_loop(0, iterations, body, (g, zero, zero))
        out_ref[:] = u

    return kernel


@functools.partial(jax.jit, static_argnames=("iterations", "model"))
def rof_denoise(g, lam, sigma=0.5, tau=0.25, alpha=0.002,
                iterations: int = 100, model: str = "huber",
                lam_weight=None):
    """Whole ROF/Huber-ROF solve in one Pallas kernel, state in VMEM.
    ``lam_weight`` (H, W) makes the data weight pixelwise (lam * weight) —
    the inpainting mode (cu_rof_denoising.cu:177-205). The solver
    constants ride in an SMEM params vector (operands, not static), so
    traced values jit fine and parameter sweeps reuse one compiled
    kernel."""
    H, W = g.shape
    kernel = _make_rof_kernel(H, W, iterations, model, lam_weight is not None)
    params = jnp.stack([
        jnp.asarray(lam, jnp.float32), jnp.asarray(sigma, jnp.float32),
        jnp.asarray(tau, jnp.float32), jnp.asarray(alpha, jnp.float32)])
    args = (params, g.astype(jnp.float32))
    if lam_weight is not None:
        args = args + (lam_weight.astype(jnp.float32),)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 1),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _make_tgv_kernel(H, W, iterations):
    def kernel(params_ref, f_ref, out_ref):
        alpha0, alpha1 = params_ref[0], params_ref[1]
        sigma, tau, delta = params_ref[2], params_ref[3], params_ref[4]
        f = f_ref[:]
        row, col = _masks(H, W)

        def body(_, carry):
            u, v0, v1, p0, p1, q0, q1, q2, r = carry
            # AscentP (cu_tgv.cu:37-52)
            n0 = p0 + sigma * alpha1 * (_dx_fwd(u, col, W) - v0)
            n1 = p1 + sigma * alpha1 * (_dy_fwd(u, row, H) - v1)
            den = jnp.maximum(1.0, jnp.sqrt(n0 * n0 + n1 * n1))
            p0 = n0 / den
            p1 = n1 / den
            # AscentQ (cu_tgv.cu:54-65): q += sigma a0 Epsilon(v), project
            # with the float4 norm (off-diagonal twice)
            e0 = _dx_fwd(v0, col, W)
            e1 = _dy_fwd(v1, row, H)
            e2 = (_dy_fwd(v0, row, H) + _dx_fwd(v1, col, W)) / 2.0
            m0 = q0 + sigma * alpha0 * e0
            m1 = q1 + sigma * alpha0 * e1
            m2 = q2 + sigma * alpha0 * e2
            qden = jnp.maximum(1.0, jnp.sqrt(m0 * m0 + m1 * m1 + 2.0 * m2 * m2))
            q0 = m0 / qden
            q1 = m1 / qden
            q2 = m2 / qden
            # AscentR (cu_tgv.cu:67-79)
            rn = (r + sigma * (u - f)) / (1.0 + sigma * delta)
            r = rn / jnp.maximum(1.0, jnp.abs(rn))
            # DescentU (cu_tgv.cu:8-20)
            u = u - tau * (r - alpha1 * _div(p0, p1, row, col))
            # DescentV (cu_tgv.cu:22-35): v += tau (a1 p + a0 div_sym q)
            d0 = _div(q0, q2, row, col)
            d1 = _div(q2, q1, row, col)
            v0 = v0 - tau * (-alpha1 * p0 - alpha0 * d0)
            v1 = v1 - tau * (-alpha1 * p1 - alpha0 * d1)
            return u, v0, v1, p0, p1, q0, q1, q2, r

        zero = jnp.zeros((H, W), jnp.float32)
        carry = (f,) + (zero,) * 8
        out = jax.lax.fori_loop(0, iterations, body, carry)
        out_ref[:] = out[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("iterations",))
def tgv_denoise(f, alpha0=2.0, alpha1=1.0, sigma=0.5, tau=0.25, delta=0.1,
                iterations: int = 100):
    """Whole TGV-L1 solve in one Pallas kernel, all 9 field planes in
    VMEM; solver constants are SMEM operands (see rof_denoise)."""
    H, W = f.shape
    kernel = _make_tgv_kernel(H, W, iterations)
    params = jnp.stack([
        jnp.asarray(alpha0, jnp.float32), jnp.asarray(alpha1, jnp.float32),
        jnp.asarray(sigma, jnp.float32), jnp.asarray(tau, jnp.float32),
        jnp.asarray(delta, jnp.float32)])
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, f.astype(jnp.float32))


def tileable(shape) -> bool:
    """TPU-resident solve needs (8, 128)-aligned planes."""
    H, W = shape
    return H % 8 == 0 and W % 128 == 0
