"""Roofline table for the headline ops (VERDICT r4 next #4).

For every headline op: HBM bytes accessed and FLOPs from XLA's own
compiled cost model (`compiled.cost_analysis()`), measured device time
(utils.timing.time_fn), and the achieved GB/s / GFLOP/s as a fraction of
this chip's MEASURED peaks (a big f32 copy calibrates HBM bandwidth; a
4k x 4k x 4k bf16 matmul calibrates the MXU). Writes a markdown table to
stdout — docs/PERF.md's "Roofline" section is this output, pasted.

Bytes from cost_analysis are what the compiled program ACTUALLY moves
(post-fusion), so ops that XLA keeps resident in VMEM report small byte
counts and show up as compute-bound instead — exactly the distinction the
floor claims need.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from kangaroo_tpu.utils.timing import time_fn


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def calibrate():
    dev = jax.devices()[0]
    # IMPORTANT (axon remote TPU): build calibration operands INSIDE jit
    # at bench-proven sizes. An EAGER jnp.zeros of 64-256 MB wedged the
    # remote terminal for its full ~1 h claim timeout, twice; the bench's
    # own ops stream same-size jit-built buffers without issue.
    # HBM: out-of-place f32 copy on a 256^2-slab-sized buffer (75 MB
    # out+in, the fusion volume class)
    make = jax.jit(lambda: jnp.full((20, 1024, 960), 0.5, jnp.float32))
    big = jax.block_until_ready(make())
    copy = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(copy(big))
    t = time_fn(copy, big, iters=50)
    bw = 2 * big.size * 4 / t / 1e9
    # MXU: bf16 2048^3 matmul
    mk = jax.jit(lambda: jnp.full((2048, 2048), 0.01, jnp.bfloat16))
    a = jax.block_until_ready(mk())
    mm = jax.jit(lambda x, y: (x @ y).astype(jnp.bfloat16))
    jax.block_until_ready(mm(a, a))
    tm = time_fn(mm, a, a, iters=50)
    tflops = 2 * 2048**3 / tm / 1e12
    print(f"chip: {dev.device_kind} | measured HBM {bw:.0f} GB/s | "
          f"measured MXU {tflops:.0f} bf16 TFLOP/s\n", flush=True)
    return bw, tflops


def main():
    bw_peak, mxu_peak = calibrate()
    rows = []

    def add(name, fn, *args, iters=10):
        jax.block_until_ready(jax.jit(fn)(*args))
        t = time_fn(jax.jit(fn), *args, iters=iters)
        flops, bts = _cost(fn, *args)
        gbs = bts / t / 1e9
        gfs = flops / t / 1e9
        rows.append((name, t * 1e3, bts / 1e6, flops / 1e9, gbs,
                     100 * gbs / bw_peak, gfs, 100 * gfs / (mxu_peak * 1e3)))
        print(f"  {name}: {t*1e3:.3f} ms", flush=True)

    rng = np.random.default_rng(0)
    from kangaroo_tpu.apps import stereo as st
    from kangaroo_tpu.apps import stereo_sgm
    from kangaroo_tpu.stereo import dispatch as fast
    from kangaroo_tpu.variational import rof, tgv

    left = jnp.asarray((rng.random((480, 640)) * 255).astype(np.uint8))
    right = jnp.asarray((rng.random((480, 640)) * 255).astype(np.uint8))
    cfg = st.StereoConfig(max_disp=64, census_window="16x16")
    lp = st.preprocess_intensity(left, cfg)
    vol = jax.block_until_ready(st.cost_volume(
        lp, st.preprocess_intensity(right, cfg), cfg))
    img = lp

    add("SGM aggregate 4-path (bf16 vol)",
        lambda v, i: fast.semi_global_matching(v, i, 0.01, 0.02), vol, img)
    add("SGM aggregate 8-path (bf16 vol)",
        lambda v, i: fast.semi_global_matching(v, i, 0.01, 0.02,
                                               do_diagonal=True), vol, img)
    add("WTA + subpixel (Pallas)",
        lambda v: fast.cost_vol_minimum_subpix(v), vol, iters=50)
    d = fast.cost_vol_minimum_subpix(vol)
    add("census (16x16) both + volume",
        lambda l, r: st.cost_volume(l, r, cfg), lp,
        st.preprocess_intensity(right, cfg), iters=30)
    add("DTAM alternation x10 (XLA, bf16 vol)",
        lambda v, l: st.dtam_solve(
            v, l, cfg.lam, cfg.theta_start, cfg.sigma_q, cfg.sigma_d,
            cfg.huber_alpha, cfg.beta, cfg.g_alpha, cfg.g_beta,
            iterations=10), vol, lp)
    add("ROF denoise x100 (Pallas, VMEM-resident)",
        lambda x: rof.denoise(x, lam=8.0, iterations=100),
        jnp.asarray(rng.random((480, 640)).astype(np.float32)), iters=100)
    add("TGV-L1 denoise x100 (Pallas, VMEM-resident)",
        lambda x: tgv.denoise(x, iterations=100),
        jnp.asarray(rng.random((480, 640)).astype(np.float32)), iters=30)

    # fusion pair at the working config
    import kangaroo_tpu as kt
    from kangaroo_tpu.core import se3
    from kangaroo_tpu.fusion import sdf as sdf_mod
    from kangaroo_tpu.fusion import separable as sep
    from kangaroo_tpu.geometry import depth as depth_mod

    W, H = 640, 480
    K = kt.Intrinsics.centered(550.0, W, H)
    bbox = kt.BoundingBox.create((-1, -1, -1), (1, 1, 1))
    tvol = kt.TsdfVolume.create(256, 256, 256, bbox, trunc_dist=0.03)
    tvol = sdf_mod.sdf_sphere(tvol, (0.0, 0.0, 0.0), 0.7)
    T_wc = jnp.asarray(se3.make(np.eye(3), [0.0, 0.0, -3.0]))
    T_cw = se3.inverse(T_wc)
    depth = jnp.full((H, W), 2.3)
    vbo = depth_mod.depth_to_vbo(depth, K)
    normals = depth_mod.normals_from_vbo(vbo)
    add("separable TSDF fuse 256^3 (full sweep)",
        lambda v, w: sep.sdf_fuse_separable(
            kt.TsdfVolume(v, w, bbox), depth, normals, T_cw, K, 0.03,
            1000.0, 0.1).val, tvol.val, tvol.weight, iters=8)
    add("separable raycast 256^3 @ VGA",
        lambda v, w: sep.raycast_sdf_separable(
            kt.TsdfVolume(v, w, bbox), T_wc, K, W, H, 0.5, 8.0,
            trunc_dist=0.03)[0], tvol.val, tvol.weight, iters=8)

    print("\n| Op | measured | HBM moved | FLOPs | achieved GB/s (%peak) "
          "| achieved GFLOP/s (%MXU peak) | bound |")
    print("|---|---|---|---|---|---|---|")
    for (name, ms, mb, gf, gbs, bpct, gfs, fpct) in rows:
        bound = "HBM" if bpct > 2 * fpct else (
            "MXU" if fpct > 2 * bpct else "mixed/VPU")
        print(f"| {name} | {ms:.2f} ms | {mb:.0f} MB | {gf:.1f} GF "
              f"| {gbs:.0f} ({bpct:.0f}%) | {gfs:.0f} ({fpct:.1f}%) "
              f"| {bound} |")


if __name__ == "__main__":
    main()
