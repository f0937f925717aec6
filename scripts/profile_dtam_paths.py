"""Arbitrate the r4 DTAM contradiction (VERDICT r4 weak #1).

Times the SAME cold 50-iteration VGA/64 DTAM solve (solve only, shared
census volume) through every formulation in the repo on the real TPU:

  a. pallas-whole   — stereo/dtam_pallas.py (volume resident in VMEM;
                      the route bench.py's dtam_stereo_cold50_ms took
                      through apps.stereo.dtam_solve)     [r4: 8.67 ms]
  b. xla-loop+pallas-wta — apps.stereo.dtam_solve's fori_loop twin with
                      the per-iteration sweep through the Pallas WTA
                      kernel (wta_pallas)
  c. xla-loop(pure)  — same loop, sweep forced to the XLA
                      cost_vol_minimum_square_penalty_subpix
  d. sharded-1      — parallel/sharding.sharded_dtam_solve on a 1-device
                      mesh (pure-XLA slab WTA + halo)     [r4: 5.84 ms]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dtam_paths.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.apps import stereo as stereo_app
from kangaroo_tpu.utils.timing import time_fn

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


def solve(v, l):
    return stereo_app.dtam_solve(v, l, cfg.lam, cfg.theta_start, cfg.sigma_q,
                                 cfg.sigma_d, cfg.huber_alpha, cfg.beta,
                                 cfg.g_alpha, cfg.g_beta, iterations=ITERS)


ref, _ = run("pallas-whole", solve)

from kangaroo_tpu.stereo import dtam_pallas

orig_fits = dtam_pallas.fits
dtam_pallas.fits = lambda v: False
try:
    b, _ = run("xla-loop(+pallas-wta)", solve)
    os.environ["KANGAROO_FORCE_XLA"] = "1"
    jax.clear_caches()
    c, _ = run("xla-loop(pure-xla)", solve)
    del os.environ["KANGAROO_FORCE_XLA"]
    jax.clear_caches()
finally:
    dtam_pallas.fits = orig_fits

from kangaroo_tpu.parallel import mesh as mesh_mod
from kangaroo_tpu.parallel import sharding as sh

mesh = mesh_mod.make_mesh(1)


def solve_sharded(v, l):
    return sh.sharded_dtam_solve(v, l, cfg.lam, cfg.theta_start, cfg.sigma_q,
                                 cfg.sigma_d, cfg.huber_alpha, cfg.beta,
                                 cfg.g_alpha, cfg.g_beta, mesh,
                                 iterations=ITERS)


d, _ = run("sharded-1", solve_sharded)

for name, x in [("xla-loop(+pallas-wta)", b), ("xla-loop(pure-xla)", c),
                ("sharded-1", d)]:
    same = np.array_equal(np.nan_to_num(x, nan=-7), np.nan_to_num(ref, nan=-7))
    print(f"bit-equal vs pallas-whole: {name:24s} {same}"
          f"  maxdiff={np.nanmax(np.abs(x - ref)):.3e}")
