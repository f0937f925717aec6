"""Hunt the sequence-replay gather gap (VERDICT r4 weak #2 / next #2).

The one-jit KF frame runs 4.08 ms with the 16-bit-halves gathers, but the
same gathers inside the sequence scan relayout-copy u16 intermediates every
iteration, so the replay falls back to plain f32 takes and pays 6.12
ms/frame. This script times the 8-frame 256^3/VGA scan replay with the
association-class gathers routed through candidate formulations:

  plain   — jnp.take on f32                     [r4 shipping: 6.12 ms]
  bits    — u16-halves rows (the standalone route; loses in scan)
  split   — per-channel u16-halves takes (the u16[N,4] fuse pack was the
            relayouted buffer; N,2 takes may lay out clean)
  u32     — bitcast to u32, integer take, bitcast back
  barrier — bits route with optimization_barrier fencing the u16 buffers

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_kf_scan_gathers.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from kangaroo_tpu.apps import kinectfusion as kf
from kangaroo_tpu.apps import synthetic
from kangaroo_tpu.core import sampling, se3
from kangaroo_tpu.fusion.separable import _view_axis_index
from kangaroo_tpu.utils.timing import time_fn

W, H, res, n_frames = 640, 480, 256, 8
K = kt.Intrinsics.centered(550.0, W, H)
cfg = kf.KinectFusionConfig(w=W, h=H, vol_res=res, vol_extent=1.2,
                            max_levels=4, its=(1, 0, 2, 3), near=0.5, far=6.0)
pipe = kf.KinectFusion(K, cfg)
scene = synthetic.sphere_scene(res=128)
frames = list(synthetic.depth_sequence(n_frames + 1, K, W, H, scene=scene,
                                       step=0.01))
T0, d0 = frames[0]
pipe.T_wl = jnp.asarray(T0)
pipe.process_frame(jnp.where(jnp.isfinite(d0), d0, 0.0))
depths = jnp.stack([jnp.where(jnp.isfinite(d), d, 0.0) for _, d in frames[1:]])
firsts = jnp.zeros((n_frames,), bool)
axis = int(_view_axis_index(se3.inverse(pipe.T_wl)))
lo, hi = pipe.vol.bbox.lo, pipe.vol.bbox.hi
val0, wgt0, T0j = pipe.vol.val, pipe.vol.weight, pipe.T_wl


def take_plain(flat, idx):
    return jnp.take(flat, idx, axis=0)


def take_bits(flat, idx):
    return sampling.take_f32_bits(flat, idx)


def take_split(flat, idx):
    if flat.ndim == 1:
        return sampling.take_f32_bits(flat, idx)
    return jnp.stack([sampling.take_f32_bits(flat[:, c], idx)
                      for c in range(flat.shape[1])], axis=-1)


def take_u32(flat, idx):
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    return jax.lax.bitcast_convert_type(jnp.take(bits, idx, axis=0),
                                        jnp.float32)


def take_barrier(flat, idx):
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint16)
    if flat.ndim == 2:
        bits = bits.reshape(flat.shape[0], -1)
    bits = jax.lax.optimization_barrier(bits)
    got = jax.lax.optimization_barrier(jnp.take(bits, idx, axis=0))
    return jax.lax.bitcast_convert_type(
        got.reshape(*idx.shape, flat.shape[1], 2) if flat.ndim == 2 else got,
        jnp.float32)


ROUTES = {"plain": take_plain, "bits": take_bits, "split": take_split,
          "u32": take_u32, "barrier": take_barrier}

orig = sampling.take_f32
ref = None
for name, route in ROUTES.items():
    sampling.take_f32 = lambda flat, idx, bits=True, _r=route: _r(flat, idx)
    jax.clear_caches()
    try:
        runner = kf.make_sequence_runner(K, cfg, pipe.trunc_dist,
                                         sweep_axis=axis, gather_bits=True)

        def seq(val, weight, T_wl, depths):
            return runner(val, weight, T_wl, depths, firsts, lo, hi)

        out = jax.block_until_ready(seq(val0, wgt0, T0j, depths))
        poses = np.asarray(out[3])
        if ref is None:
            ref = poses
        ok = np.array_equal(poses, ref)
        ms = time_fn(seq, val0, wgt0, T0j, depths, iters=4) * 1e3 / n_frames
        print(f"{name:8s} {ms:7.3f} ms/frame   poses bit-equal: {ok}",
              flush=True)
    finally:
        sampling.take_f32 = orig
