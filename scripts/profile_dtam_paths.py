"""Arbitrate the r4 DTAM contradiction (VERDICT r4 weak #1).

Times the SAME cold 50-iteration VGA/64 DTAM solve (solve only, shared
census volume) through every formulation in the repo on the real TPU.
r5 outcome (docs/PERF.md "The DTAM arbitration"): the pure-XLA loop wins
(~4.6-4.7 ms) and apps.stereo.dtam_solve now IS that route; the Pallas
formulations measure ~7.5 ms and the whole-solve kernel's compiled
lowering additionally diverges from its own interpret semantics, so this
script keeps them callable as study artifacts:

  a. pallas-whole     — stereo/dtam_pallas.dtam_solve (volume resident
                        in VMEM; the route bench.py's dtam_stereo_cold50_ms
                        took through r4's apps.stereo.dtam_solve) [r4: 8.67 ms]
  b. xla+pallas-wta   — the production fori_loop but with the per-iteration
                        sweep through the Pallas WTA kernel (what r4's
                        "XLA loop" floor measurement actually was)
  c. pure-xla         — apps.stereo.dtam_solve (production since r5): two
                        fused bf16 volume streams per iteration
  d. sharded-1        — parallel/sharding.sharded_dtam_solve on a 1-device
                        mesh (pure-XLA slab WTA + halo)           [r4: 5.84 ms]

Also prints max |diff| of a/b/d vs c compiled — documenting (b)/(d)
parity and the (a) compiled-lowering divergence (interpret-mode a matches
c to 4e-6; tests/test_pallas_kernels.py keeps asserting that).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dtam_paths.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.apps import stereo as stereo_app
from kangaroo_tpu.stereo import costvolume as cv
from kangaroo_tpu.stereo import dispatch as fast
from kangaroo_tpu.stereo import dtam_pallas
from kangaroo_tpu.utils.timing import time_fn
from kangaroo_tpu.variational import rof

ITERS = 50
cfg = stereo_app.StereoConfig(max_disp=64, census_window="16x16",
                              dtam_iterations=ITERS)
rng = np.random.default_rng(0)
left_u8 = jnp.asarray((rng.random((480, 640)) * 255).astype(np.uint8))
right_u8 = jnp.asarray((rng.random((480, 640)) * 255).astype(np.uint8))
left = stereo_app.preprocess_intensity(left_u8, cfg)
vol = stereo_app.cost_volume(left, stereo_app.preprocess_intensity(right_u8, cfg), cfg)
vol = jax.block_until_ready(vol)
print("vol", vol.shape, vol.dtype, flush=True)


def run(name, f):
    out = jax.block_until_ready(f(vol, left))
    ms = time_fn(f, vol, left, iters=8) * 1e3
    print(f"{name:24s} {ms:7.3f} ms", flush=True)
    return np.asarray(out), ms


def solve_pure_xla(v, l):
    return stereo_app.dtam_solve(v, l, cfg.lam, cfg.theta_start, cfg.sigma_q,
                                 cfg.sigma_d, cfg.huber_alpha, cfg.beta,
                                 cfg.g_alpha, cfg.g_beta, iterations=ITERS)


def solve_pallas_whole(v, l):
    g = cv.exponential_edge_weight(l, cfg.g_alpha, cfg.g_beta)
    d0 = fast.cost_vol_minimum_subpix(v, -1)
    return dtam_pallas.dtam_solve(v, g, d0, cfg.lam, cfg.theta_start,
                                  cfg.sigma_q, cfg.sigma_d, cfg.huber_alpha,
                                  cfg.beta, iterations=ITERS, sd=-1)


def solve_xla_pallas_wta(v, l):
    # the production loop shape, but the per-iteration sweep through the
    # Pallas WTA dispatcher — r4's "XLA loop" floor configuration
    g = cv.exponential_edge_weight(l, cfg.g_alpha, cfg.g_beta)
    d0 = fast.cost_vol_minimum_subpix(v, -1)
    q0 = jnp.zeros(d0.shape + (2,), jnp.float32)

    def body(n, carry):
        d, a, q, theta = carry
        q = rof.weighted_huber_dual_ascent_p(q, d, g, cfg.sigma_q,
                                             cfg.huber_alpha)
        d = rof.weighted_l2_primal_descent(d, q, a, g, cfg.sigma_d,
                                           1.0 / theta)
        a = fast.cost_vol_minimum_square_penalty_subpix(v, d, cfg.lam,
                                                        theta, -1)
        theta = theta * (1.0 - cfg.beta * (n + 1.0))
        return (d, a, q, theta)

    d, a, q, theta = jax.lax.fori_loop(
        0, ITERS, body, (d0, d0, q0, jnp.float32(cfg.theta_start)))
    return d


a, _ = run("pallas-whole", solve_pallas_whole)
b, _ = run("xla-loop(+pallas-wta)", solve_xla_pallas_wta)
c, _ = run("pure-xla (production)", solve_pure_xla)

from kangaroo_tpu.parallel import mesh as mesh_mod
from kangaroo_tpu.parallel import sharding as sh

mesh = mesh_mod.make_mesh(1)


def solve_sharded(v, l):
    return sh.sharded_dtam_solve(v, l, cfg.lam, cfg.theta_start, cfg.sigma_q,
                                 cfg.sigma_d, cfg.huber_alpha, cfg.beta,
                                 cfg.g_alpha, cfg.g_beta, mesh,
                                 iterations=ITERS)


d, _ = run("sharded-1", solve_sharded)

for name, x in [("pallas-whole", a), ("xla-loop(+pallas-wta)", b),
                ("sharded-1", d)]:
    same = np.array_equal(np.nan_to_num(x, nan=-7), np.nan_to_num(c, nan=-7))
    print(f"vs pure-xla: {name:24s} bit-equal={same}"
          f"  maxdiff={np.nanmax(np.abs(x - c)):.3e}")
