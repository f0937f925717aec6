"""Roofline table for the headline ops (VERDICT r4 next #4).

For every headline op: the ALGORITHM'S minimum HBM bytes in+out and its
op-count FLOPs (stated per row below — properties of the algorithm, not
the compiler), measured device time (utils.timing.time_fn at high
repetition counts), and the achieved GB/s / GFLOP/s as a fraction of the
chip's peaks: the bf16 MXU peak is MEASURED (chained-matmul loop); the
HBM denominator is the 819 GB/s spec peak, because every streaming probe
XLA couldn't optimise away topped out at ~540 GB/s (see calibrate()'s
docstring for the five-attempt history). Writes a markdown table to
stdout — docs/PERF.md's "Roofline" section is this output, pasted.

XLA's `compiled.cost_analysis()` bytes are kept as a diagnostic column
only: they count LOGICAL accesses (census read "1732 MB" in 0.135 ms —
12.8 TB/s, 16x over the physical peak) and see 0 bytes inside
pallas_call, so they cannot anchor a floor claim in either direction.

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


def _slope(make_loop, x0, n_hi=400):
    """Device-pure slope of one loop iteration: time(n_hi) - time(1) over
    (n_hi - 1), min of 3 samples each (same method as utils.timing.time_fn
    but with the FULL ARRAY as the loop carry). The operand MUST be a
    runtime argument: with the init traced as a constant XLA folds the
    whole elementwise loop at compile time (both endpoints then just
    materialise a constant — measured a NEGATIVE slope twice)."""
    import time as _time

    g1 = jax.jit(make_loop(1))
    gn = jax.jit(make_loop(n_hi))

    def run(g):
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            out = g(x0)
            _ = float(jnp.asarray(out).ravel()[0])  # scalar read = real sync
            best = min(best, _time.perf_counter() - t0)
        return best

    run(g1), run(gn)  # compile both
    return (run(gn) - run(g1)) / (n_hi - 1)


def calibrate():
    """Probe the chip's achievable rates; quote %-of-peak vs the SPEC peak.

    Getting an honest HBM number out of XLA took five attempts, preserved
    here as a warning (all "measured" numbers through utils.timing.time_fn
    slopes through the tunnel):

    1. trivial body (x + 1.0): collapses to a scalar chain inside the
       repeat loop -> 12,918 "GB/s".
    2. chained full-array loop, constant init: XLA constant-folds the
       ENTIRE loop at compile time -> negative slope.
    3. runtime operand, returning x[:1]: elementwise loops get narrowed
       to a scalar chain -> negative again.
    4. runtime operand + sum output, 75 MB buffer: the buffer fits v5e's
       128 MB VMEM (and an elementwise body permits loop interchange),
       so iterations cost no HBM traffic -> 72,258 "GB/s" at n=400.
    5. 300 MB buffer + per-iteration roll (cross-element dependency, no
       interchange): stable and real, but measures the roll kernel's own
       two-pass lowering: 222-231 GB/s on 600 MB/iter accounting, ~432
       on 1.2 GB/iter accounting.

    Direct probes on 300 MB operands: pure read-reduce 229 GB/s (the
    reduction tree, not the wire, is the limit), stencil add
    (x[1:] + x[:-1], read+write) 539 GB/s. No probe reaches the 819 GB/s
    v5e spec, and the framework's best real kernel (the DTAM sweep, 480
    GB/s against its analytic minimum) sits within 11% of the best
    probe. So: GB/s columns below are quoted against the SPEC peak as a
    conservative lower bound on achieved fraction; the MXU peak IS
    measured (chained 2048^3 bf16 matmuls converge to 190 TFLOP/s at
    n_hi=400, 96% of the 197 spec).
    """
    dev = jax.devices()[0]
    shape = (80, 1024, 960)
    x0 = jax.block_until_ready(jax.jit(
        lambda: jax.lax.broadcasted_iota(jnp.float32, shape, 2) * 1e-6
        + 0.5)())
    f = lambda x: jnp.sum(x * 1.000001)[None]
    tr = time_fn(jax.jit(f), x0, iters=100)
    g = lambda x: x[1:] + x[:-1]
    ts = time_fn(jax.jit(g), x0, iters=60, reduce_outputs=True)
    N = 2048

    def mk_mm(n):
        def f(a):
            def body(i, v):
                w = (v @ a).astype(jnp.bfloat16)
                return (w * jnp.bfloat16(1.0 / (N * 0.01))).astype(
                    jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, a).ravel()[:1]
        return f

    a0 = jax.block_until_ready(jax.jit(
        lambda: jnp.full((N, N), 0.01, jnp.bfloat16))())
    tm = _slope(mk_mm, a0, n_hi=400)
    tflops = 2 * N**3 / tm / 1e12
    bw_spec = 819.0
    print(f"chip: {dev.device_kind} | HBM probes: read-reduce "
          f"{x0.size*4/tr/1e9:.0f} GB/s, stencil r+w "
          f"{3*x0.size*4/ts/1e9:.0f} GB/s (spec {bw_spec:.0f}, used for "
          f"%peak) | measured MXU {tflops:.1f} bf16 TFLOP/s\n", flush=True)
    return bw_spec, tflops


def main():
    bw_peak, mxu_peak = calibrate()
    rows = []

    def add(name, fn, *args, iters=60, min_mb=0.0, min_gf=0.0):
        # iters must be large: through the tunnel the slope's two
        # endpoints each carry ~ms-scale jitter, so a 10-rep slope of a
        # sub-ms op is noise-dominated (one run read the DTAM iteration
        # at 17 us — below its own 39 MB/iter HBM minimum).
        jax.block_until_ready(jax.jit(fn)(*args))
        t = time_fn(jax.jit(fn), *args, iters=iters)
        _, xla_bts = _cost(fn, *args)
        gbs = min_mb * 1e6 / t / 1e9
        gfs = min_gf * 1e9 / t / 1e9
        rows.append((name, t * 1e3, min_mb, min_gf, xla_bts / 1e6, gbs,
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

    # min bytes: 2 passes read the bf16 vol (2 x 39.3 MB); the f32 aliased
    # accumulator is written in pass 1 and read+written in pass 2
    # (3 x 78.6 MB). FLOPs: 19.66M elems x n_dirs x ~10 recurrence ops.
    add("SGM aggregate 4-path (bf16 vol)",
        lambda v, i: fast.semi_global_matching(v, i, 0.01, 0.02), vol, img,
        min_mb=314.6, min_gf=0.79)
    add("SGM aggregate 8-path (bf16 vol)",
        lambda v, i: fast.semi_global_matching(v, i, 0.01, 0.02,
                                               do_diagonal=True), vol, img,
        min_mb=314.6, min_gf=1.57)
    # min bytes: one bf16 vol read + f32 disparity write
    add("WTA + subpixel (Pallas)",
        lambda v: fast.cost_vol_minimum_subpix(v), vol, iters=200,
        min_mb=40.6, min_gf=0.08)
    d = fast.cost_vol_minimum_subpix(vol)
    # min bytes: 2 image reads + bf16 vol write (census fuses into the
    # volume build). FLOPs: 19.66M x (8 xor + 8 popcount + ~6 misc)
    add("census (16x16) both + volume",
        lambda l, r: st.cost_volume(l, r, cfg), lp,
        st.preprocess_intensity(right, cfg), iters=100,
        min_mb=41.8, min_gf=0.43)
    add("DTAM alternation x10 (XLA, bf16 vol)",
        lambda v, l: st.dtam_solve(
            v, l, cfg.lam, cfg.theta_start, cfg.sigma_q, cfg.sigma_d,
            cfg.huber_alpha, cfg.beta, cfg.g_alpha, cfg.g_beta,
            iterations=10), vol, lp,
        min_mb=466.7, min_gf=0.9)
    # min bytes: 10 x (one fused bf16 vol stream for the aux sweep +
    # ~6 image-sized q/d/a/g reads+writes); the measured time PROVES the
    # argmin and parabola passes share one stream (two would need
    # 1014 GB/s, over the physical peak)
    add("ROF denoise x100 (Pallas, VMEM-resident)",
        lambda x: rof.denoise(x, lam=8.0, iterations=100),
        jnp.asarray(rng.random((480, 640)).astype(np.float32)), iters=100,
        min_mb=2.5, min_gf=0.77)  # HBM: in+out only; state is VMEM-resident
    add("TGV-L1 denoise x100 (Pallas, VMEM-resident)",
        lambda x: tgv.denoise(x, iterations=100),
        jnp.asarray(rng.random((480, 640)).astype(np.float32)), iters=40,
        min_mb=2.5, min_gf=1.84)  # ~60 VPU ops/px/iter over 9 field planes

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
            1000.0, 0.1).val, tvol.val, tvol.weight, iters=30,
        min_mb=273.0, min_gf=4.0)
    # min bytes: read+write val and weight (4 x 67.1 MB f32) + warped
    # image planes; FLOPs from the per-plane lerp-matrix MXU resamples
    add("separable raycast 256^3 @ VGA",
        lambda v, w: sep.raycast_sdf_separable(
            kt.TsdfVolume(v, w, bbox), T_wc, K, W, H, 0.5, 8.0,
            trunc_dist=0.03)[0], tvol.val, tvol.weight, iters=30,
        min_mb=70.0, min_gf=2.2)
    # min bytes: one val volume read + output depth image (the sweep's
    # resampled planes fuse with the k-scan; weight is not read)

    print("\n| Op | measured | min HBM | op FLOPs | XLA-logical bytes "
          "| >=GB/s (%peak) | GFLOP/s (%MXU) |")
    print("|---|---|---|---|---|---|---|")
    for (name, ms, mb, gf, xmb, gbs, bpct, gfs, fpct) in rows:
        print(f"| {name} | {ms:.2f} ms | {mb:.0f} MB | {gf:.2f} GF "
              f"| {xmb:.0f} MB | {gbs:.0f} ({bpct:.0f}%) "
              f"| {gfs:.0f} ({fpct:.2f}%) |")


if __name__ == "__main__":
    main()
