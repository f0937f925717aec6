"""Whole-DTAM-alternation Pallas kernel: cost volume + primal-dual state
resident in VMEM for every iteration.

The XLA fori_loop in apps.stereo.dtam_solve re-streams the full cost volume
from HBM on every auxiliary exhaustive search (stereo/main.cpp:354-383's
per-frame alternation; CostVolMinimumSquarePenaltySubpix,
cu_dense_stereo.cu:123-174) — ~39 MB (bf16) x iterations of pure HBM
traffic that dominates the frame. A VGA/64 bf16 volume plus the five (H, W)
f32 field planes fits in VMEM, so this kernel loads the volume ONCE and
runs the whole alternation on-chip, reading it from VMEM each iteration.

Per iteration (op-for-op the same arithmetic as dtam_solve's body, so
results are bit-identical):
  q  <- project_unit_ball((q + sigma_q * g * grad(d)) / (1 + sigma_q alpha))
  d  <- (d + sigma_d * (g * div(q) + a / theta)) / (1 + sigma_d / theta)
  a  <- argmin_z 1/(2 theta) (d - z)^2 + lam C(x, z)   [+ subpixel parabola]
  theta <- theta * (1 - beta (n+1))
The exhaustive search is a running min over the D volume slices with the
parabola neighbours tracked in the same pass (C(bestd-1) from the previous
slice, C(bestd+1) caught one slice later), matching wta_pallas._wta_sq_kernel
and costvolume.cost_vol_minimum_square_penalty_subpix exactly.

Dispatched from apps.stereo.dtam_solve when the volume + fields fit the
VMEM budget; the XLA fori_loop remains the fallback twin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..variational.pallas_solvers import _div, _dx_fwd, _dy_fwd, _masks

_BIG = 1e10
# VMEM budget for volume + field planes (v5e has 128 MiB; leave headroom
# for temporaries and double-buffered IO)
_VMEM_BUDGET = 88 * 1024 * 1024


def fits(vol) -> bool:
    D, H, W = vol.shape
    plane = H * W * 4
    return (H % 8 == 0 and W % 128 == 0
            and vol.size * vol.dtype.itemsize + 10 * plane <= _VMEM_BUDGET)


def _make_kernel(D, H, W, iterations, sd):
    def kernel(params_ref, vol_ref, g_ref, d0_ref, out_ref):
        lam = params_ref[0]
        theta0 = params_ref[1]
        sigma_q = params_ref[2]
        sigma_d = params_ref[3]
        alpha = params_ref[4]
        beta = params_ref[5]
        gw = g_ref[:]
        row, col = _masks(H, W)

        def aux_search(lastd, inv2theta):
            """Running exhaustive search over the D slices (one VMEM pass)."""
            best = jnp.full((H, W), _BIG, jnp.float32)
            bestd = jnp.zeros((H, W), jnp.int32)
            vl = jnp.zeros((H, W), jnp.float32)
            vr = jnp.zeros((H, W), jnp.float32)
            cprev = jnp.zeros((H, W), jnp.float32)
            for d in range(D):
                c = vol_ref[d].astype(jnp.float32)
                dd = lastd - jnp.float32(d)
                cost = inv2theta * dd * dd + lam * c
                xr = col + sd * d
                cost = jnp.where((xr >= 0) & (xr < W), cost, _BIG)
                newbest = cost < best
                best = jnp.where(newbest, cost, best)
                bestd = jnp.where(newbest, d, bestd)
                # volume value at clamp(bestd-1, 0): previous slice (d=0: c)
                vl = jnp.where(newbest, cprev if d > 0 else c, vl)
                if d > 0:
                    # bestd was set one slice ago -> this slice is bestd+1
                    vr = jnp.where(bestd == d - 1, c, vr)
                cprev = c
            # clamp(bestd+1, D-1) at the top edge reads slice D-1 itself
            vr = jnp.where(bestd == D - 1, cprev, vr)

            bf = bestd.astype(jnp.float32)
            dlf = bf - 1.0
            drf = bf + 1.0
            cl = inv2theta * (lastd - dlf) ** 2 + lam * vl
            cr = inv2theta * (lastd - drf) ** 2 + lam * vr
            subp = bf - (cr - cl) / (2.0 * (cr - 2.0 * best + cl))
            bestxr = col + sd * bestd
            interior = (bestxr > 0) & (bestxr < W - 1)
            sensible = (subp > dlf) & (subp < drf)
            return jnp.where(interior & sensible, subp, bf)

        def body(n, carry):
            dcur, a, q0, q1, theta = carry
            # WeightedHuberGradU_DualAscentP (cu_rof_denoising.cu:114-141)
            gx = _dx_fwd(dcur, col, W)
            gy = _dy_fwd(dcur, row, H)
            n0 = (q0 + sigma_q * gw * gx) / (1.0 + sigma_q * alpha)
            n1 = (q1 + sigma_q * gw * gy) / (1.0 + sigma_q * alpha)
            den = jnp.maximum(1.0, jnp.sqrt(n0 * n0 + n1 * n1))
            q0 = n0 / den
            q1 = n1 / den
            # WeightedL2_u_minus_g_PrimalDescent (cu_rof_denoising.cu:211-236)
            lam_t = 1.0 / theta
            divq = _div(q0, q1, row, col)
            dcur = (dcur + sigma_d * (gw * divq + lam_t * a)) / (
                1.0 + sigma_d * lam_t)
            a = aux_search(dcur, 0.5 / theta)
            theta = theta * (1.0 - beta * (n.astype(jnp.float32) + 1.0))
            return dcur, a, q0, q1, theta

        d0 = d0_ref[:]
        zero = jnp.zeros((H, W), jnp.float32)
        dcur, _, _, _, _ = jax.lax.fori_loop(
            0, iterations, body, (d0, d0, zero, zero, jnp.float32(theta0)))
        out_ref[:] = dcur

    return kernel


@functools.partial(jax.jit, static_argnames=("iterations", "sd"))
def dtam_solve(vol, g, d0, lam, theta_start, sigma_q, sigma_d, huber_alpha,
               beta, iterations: int = 80, sd: int = -1):
    """Run the full DTAM alternation in one Pallas kernel.

    ``vol`` (D, H, W) f32/bf16 cost volume, ``g`` (H, W) edge weights,
    ``d0`` (H, W) WTA initialisation (also seeds the auxiliary variable).
    Returns the refined (H, W) disparity.
    """
    D, H, W = vol.shape
    params = jnp.stack([
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(theta_start, jnp.float32),
        jnp.asarray(sigma_q, jnp.float32),
        jnp.asarray(sigma_d, jnp.float32),
        jnp.asarray(huber_alpha, jnp.float32),
        jnp.asarray(beta, jnp.float32),
    ])
    v = vol if vol.dtype == jnp.bfloat16 else vol.astype(jnp.float32)
    return pl.pallas_call(
        _make_kernel(D, H, W, iterations, sd),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(params, v, g.astype(jnp.float32), d0.astype(jnp.float32))
