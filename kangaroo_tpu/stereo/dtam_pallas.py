"""Whole-DTAM-alternation Pallas kernel: cost volume + primal-dual state
resident in VMEM for every iteration.

.. warning:: NOT dispatched in production (r5). Two findings retired it:
   (a) it is SLOWER than the XLA fori_loop twin on this chip (7.5 vs 4.6
   ms for the VGA/64 cold-50 solve — the VMEM-resident aux search is
   VPU-op-bound above the XLA route's two-HBM-stream cost;
   scripts/profile_dtam_paths.py), and (b) its COMPILED TPU lowering
   diverges from its own interpret-mode semantics (max 2.9 px difference
   after ONE iteration at VGA/64, 96% of pixels different after 50, while
   interpret mode matches the XLA twin to 4e-6 at the same shape, and the
   same stencil helpers compiled inside variational/pallas_solvers match
   to 2e-7 over 100 iterations) — i.e. a Mosaic compilation defect
   specific to this kernel's shape (39 MB VMEM-resident bf16 volume +
   64-slice unrolled sweep + aliased state), not an algorithm bug. The
   module is retained as the interpret-verified formulation and for the
   regression tests that document it.

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
  theta <- theta * (1 - beta (n0 + i))   [n0 = 1 for the cold solve; the
           incremental driver passes the reference's GLOBAL counter n,
           main.cpp:381 `theta *= (1-beta*n); ++n`]
The exhaustive search is a running min over the D volume slices with the
parabola neighbours tracked in the same pass (C(bestd-1) from the previous
slice, C(bestd+1) caught one slice later), matching wta_pallas._wta_sq_kernel
and costvolume.cost_vol_minimum_square_penalty_subpix exactly.

Dispatched from apps.stereo.dtam_solve when the volume + fields fit the
VMEM budget; the XLA fori_loop remains the fallback twin. ``dtam_step``
exposes the same kernel with the full (d, a, q, theta) state in and out —
the incremental per-frame schedule (apps.stereo.VariationalStereo) resumes
the alternation across frames exactly like the reference's persistent
imgd/imga/imgq buffers.
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
    def kernel(params_ref, vol_ref, g_ref, d0_ref, a0_ref, q00_ref, q10_ref,
               out_d_ref, out_a_ref, out_q0_ref, out_q1_ref):
        lam = params_ref[0]
        theta0 = params_ref[1]
        sigma_q = params_ref[2]
        sigma_d = params_ref[3]
        alpha = params_ref[4]
        beta = params_ref[5]
        n0 = params_ref[6]
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
            n0_ = (q0 + sigma_q * gw * gx) / (1.0 + sigma_q * alpha)
            n1_ = (q1 + sigma_q * gw * gy) / (1.0 + sigma_q * alpha)
            den = jnp.maximum(1.0, jnp.sqrt(n0_ * n0_ + n1_ * n1_))
            q0 = n0_ / den
            q1 = n1_ / den
            # WeightedL2_u_minus_g_PrimalDescent (cu_rof_denoising.cu:211-236)
            lam_t = 1.0 / theta
            divq = _div(q0, q1, row, col)
            dcur = (dcur + sigma_d * (gw * divq + lam_t * a)) / (
                1.0 + sigma_d * lam_t)
            a = aux_search(dcur, 0.5 / theta)
            theta = theta * (1.0 - beta * (n0 + n.astype(jnp.float32)))
            return dcur, a, q0, q1, theta

        dcur, a, q0, q1, _ = jax.lax.fori_loop(
            0, iterations, body,
            (d0_ref[:], a0_ref[:], q00_ref[:], q10_ref[:],
             jnp.float32(theta0)))
        out_d_ref[:] = dcur
        out_a_ref[:] = a
        out_q0_ref[:] = q0
        out_q1_ref[:] = q1

    return kernel


def _run(vol, g, d0, a0, q0, q1, lam, theta, sigma_q, sigma_d, huber_alpha,
         beta, n0, iterations, sd):
    D, H, W = vol.shape
    params = jnp.stack([
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(theta, jnp.float32),
        jnp.asarray(sigma_q, jnp.float32),
        jnp.asarray(sigma_d, jnp.float32),
        jnp.asarray(huber_alpha, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.asarray(n0, jnp.float32),
    ])
    v = vol if vol.dtype == jnp.bfloat16 else vol.astype(jnp.float32)
    out = pl.pallas_call(
        _make_kernel(D, H, W, iterations, sd),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((H, W), jnp.float32)
                        for _ in range(4)),
        # the alternation updates (d, a, q) in place: aliasing the state
        # inputs onto the outputs drops four (H, W) stack buffers — the
        # VGA/64 cold solve is otherwise ~0.5 MB over the scoped-VMEM limit
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(params, v, g.astype(jnp.float32), d0.astype(jnp.float32),
      a0.astype(jnp.float32), q0.astype(jnp.float32),
      q1.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=("iterations", "sd"))
def dtam_solve(vol, g, d0, lam, theta_start, sigma_q, sigma_d, huber_alpha,
               beta, iterations: int = 80, sd: int = -1):
    """Run the full DTAM alternation in one Pallas kernel (cold solve).

    ``vol`` (D, H, W) f32/bf16 cost volume, ``g`` (H, W) edge weights,
    ``d0`` (H, W) WTA initialisation (also seeds the auxiliary variable).
    Returns the refined (H, W) disparity.
    """
    H, W = d0.shape
    zero = jnp.zeros((H, W), jnp.float32)
    out = _run(vol, g, d0, d0, zero, zero, lam, theta_start, sigma_q,
               sigma_d, huber_alpha, beta, 1.0, iterations, sd)
    return out[0]


@functools.partial(jax.jit, static_argnames=("iterations", "sd"))
def dtam_step(vol, g, d, a, q, theta, n, lam, sigma_q, sigma_d, huber_alpha,
              beta, iterations: int = 5, sd: int = -1):
    """Resume the alternation from full state for ``iterations`` steps —
    the reference's incremental per-frame schedule (main.cpp:368-383).
    ``q`` is (H, W, 2); ``n`` the global annealing counter. Returns
    (d, a, q, theta, n)."""
    out = _run(vol, g, d, a, q[..., 0], q[..., 1], lam, theta, sigma_q,
               sigma_d, huber_alpha, beta, n, iterations, sd)
    d_o, a_o, q0_o, q1_o = out
    # sequential f32 multiply in the kernel's exact order (a jnp.prod of the
    # factors rounds differently)
    theta_o = jnp.asarray(theta, jnp.float32)
    n32 = jnp.asarray(n, jnp.float32)
    for i in range(iterations):
        theta_o = theta_o * (1.0 - beta * (n32 + i))
    return d_o, a_o, jnp.stack([q0_o, q1_o], axis=-1), theta_o, n + iterations
