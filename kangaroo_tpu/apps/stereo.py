"""Variational (DTAM-style) stereo pipeline.

TPU-native re-implementation of applications/stereo/main.cpp:280-495: census
cost volume -> optional guided filtering -> Huber-ROF primal-dual with
auxiliary exhaustive search and theta annealing -> median / left-right /
gradient filtering -> depth map and point cloud. Var defaults from
stereo/main.cpp:192-236.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

from ..geometry import depth as depth_mod
from ..ops import integral_image as ii
from ..ops import median as median_mod
from ..stereo import census as census_mod
from ..stereo import costvolume as cv
from ..stereo import dispatch as fast
from ..variational import rof


@dataclasses.dataclass
class StereoConfig:
    max_disp: int = 128  # MAXD (stereo/main.cpp:54)
    census_window: str = "16x16"  # Census(ulong4) path (main.cpp:314)
    use_census: bool = True
    # DTAM (main.cpp:210-215)
    theta_start: float = 100.0
    theta_end: float = 1e-4
    lam: float = 20.0
    sigma_q: float = 0.7
    sigma_d: float = 0.7
    huber_alpha: float = 0.002
    beta: float = 1e-5
    # edge weights (main.cpp:207-208)
    g_alpha: float = 14.0
    g_beta: float = 2.5
    # box-mean subtract before the cost volume (ui.avg_rad,
    # main.cpp:201/309-312): img := img - boxmean(img, avg_rad) + 0.5
    avg_rad: int = 0
    # trunc-abs-grad cost mix (ui.alpha/r1/r2, main.cpp:217-219). The
    # reference KERNEL overrides alpha=0, r1=1e37 regardless of the Vars
    # (cu_dense_stereo.cu:829-830) — these defaults reproduce the effective
    # behaviour; set them to the Var defaults (0.9/100/100) for the UI's
    # declared (dead) tuning.
    tag_alpha: float = 0.0
    tag_r1: float = 1e37
    tag_r2: float = 1e37
    # guided filter (main.cpp:222-224)
    filter_volume: bool = False
    filter_rad: int = 9
    filter_eps: float = 1e-4
    # post (main.cpp:225-235)
    lr_check: bool = True
    max_disp_diff: float = 1.0
    median_its: int = 1
    median_max_bad: int = 12
    filt_grad_thresh: float = 0.0
    dtam_iterations: int = 80  # host loop runs 5/frame until theta small
    # coarse-to-fine warm start: solve the half-resolution volume first
    # (1/8 the sweep bytes), upsample its disparity as d_init, and run only
    # ``dtam_iterations`` fine iterations — the pyramid analogue of the
    # reference's incremental cross-frame schedule (main.cpp:368-383 keeps
    # imgd/imgq warm between frames instead of re-solving cold)
    coarse_init: bool = False
    coarse_iterations: int = 50


def preprocess_intensity(img, cfg: StereoConfig):
    """Front-end intensity conditioning (main.cpp:308-312): uchar scales to
    [0,1] float (ElementwiseScaleBias 1/255; float inputs are assumed
    already on that scale), then the optional zero-mean re-centre
    img - boxmean(img, avg_rad) + 0.5 (ui.avg_rad)."""
    f = img.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(img).dtype, jnp.integer):
        f = f / 255.0
    if cfg.avg_rad > 0:
        f = f - ii.box_filter(f, cfg.avg_rad) + 0.5
    return f


def cost_volume(left, right, cfg: StereoConfig, sd: int = -1):
    """Census (or truncated abs-grad) cost volume (main.cpp:314-331).

    Census volumes with a power-of-two normaliser store bfloat16 (every
    cost k/256 is bf16-exact, so the DTAM auxiliary search streams half
    the HBM bytes per iteration, bit-identically — same argument as the
    SGM pipeline); guided filtering needs f32 (its box-mean arithmetic is
    not power-of-two exact)."""
    if cfg.use_census:
        cl = census_mod.census(left, cfg.census_window)
        cr = census_mod.census(right, cfg.census_window)
        bits = census_mod.norm_bits(cfg.census_window)
        dtype = (jnp.bfloat16
                 if bits & (bits - 1) == 0 and not cfg.filter_volume
                 else jnp.float32)
        if sd < 0:
            return census_mod.census_cost_volume(cl, cr, cfg.max_disp, -1,
                                                 bits, dtype=dtype)
        return census_mod.census_cost_volume(cr, cl, cfg.max_disp, 1,
                                             bits, dtype=dtype)
    imgs = (left, right) if sd < 0 else (right, left)
    return cv.cost_volume_from_stereo_truncated_abs_and_grad(
        imgs[0].astype(jnp.float32), imgs[1].astype(jnp.float32),
        cfg.max_disp, sd, alpha=cfg.tag_alpha, r1=cfg.tag_r1, r2=cfg.tag_r2,
    )


@functools.partial(jax.jit, static_argnames=("iterations", "sd"))
def dtam_solve(vol, img_left, lam, theta_start, sigma_q, sigma_d, huber_alpha,
               beta, g_alpha, g_beta, iterations: int = 80, sd: int = -1,
               d_init=None):
    """The DTAM alternation (main.cpp:354-383), fully on-chip.

    Each iteration: weighted-Huber dual ascent on q, weighted primal descent
    on d, exhaustive auxiliary search with square penalty, theta annealing
    theta *= (1 - beta*n).

    ``d_init`` replaces the WTA-subpix initialisation (dtam_reset,
    main.cpp:354-365) — the coarse-to-fine warm start passes the upsampled
    coarse disparity here, saving both the init sweep and most of the fine
    iterations.

    The engine is the XLA fori_loop below — on TPU it is both the FASTEST
    and the only compiled-correct route (r5 arbitration,
    scripts/profile_dtam_paths.py + docs/PERF.md):

    - speed: the auxiliary search is two fused streams of the bf16 volume
      per iteration at the measured HBM rate (~92 us/iter at VGA/64),
      beating both Pallas formulations (~150 us/iter; the r4 '8.1 ms
      compute floor' was a floor of those formulations only).
    - correctness: the whole-solve-in-VMEM Pallas kernel
      (stereo/dtam_pallas.py) is bit-correct in interpret mode at this
      exact shape (max diff 4e-6 vs this loop) but its COMPILED TPU
      lowering diverges from its own interpret semantics (2.9 px max diff
      after ONE iteration at VGA/64) — a Mosaic compilation defect, so it
      is no longer dispatched; the module is retained as the
      interpret-verified study artifact.
    """
    g_img = img_left.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(img_left).dtype, jnp.integer):
        g_img = g_img / 255.0  # float inputs are already on the [0,1] scale
    g = cv.exponential_edge_weight(g_img, g_alpha, g_beta)
    # pure-XLA init WTA: a lone pallas_call in front of the XLA fori_loop
    # measured +1.8 ms on the whole solve (its operand/result layout
    # round-trips serialize against the loop; scripts/profile_dtam_paths)
    d0 = (d_init.astype(jnp.float32) if d_init is not None
          else cv.cost_vol_minimum_subpix(vol, sd))
    a0 = d0
    q0 = jnp.zeros(d0.shape + (2,), jnp.float32)

    def body(n, carry):
        d, a, q, theta = carry
        q = rof.weighted_huber_dual_ascent_p(q, d, g, sigma_q, huber_alpha)
        d = rof.weighted_l2_primal_descent(d, q, a, g, sigma_d, 1.0 / theta)
        # the PURE-XLA sweep, deliberately not the Pallas dispatcher: two
        # fused bf16 volume streams at HBM rate, ~92 us/iter at VGA/64 vs
        # ~150 us for either Pallas formulation (docs/PERF.md roofline;
        # scripts/profile_dtam_paths.py arbitrated all four routes)
        a = cv.cost_vol_minimum_square_penalty_subpix(vol, d, lam, theta, sd)
        theta = theta * (1.0 - beta * (n + 1.0))
        return (d, a, q, theta)

    d, a, q, theta = jax.lax.fori_loop(
        0, iterations, body, (d0, a0, q0, jnp.float32(theta_start))
    )
    return d


@functools.partial(jax.jit, static_argnames=("iterations", "sd"))
def dtam_increment(vol, g, d, a, q, theta, n, lam, sigma_q, sigma_d,
                   huber_alpha, beta, iterations: int = 5, sd: int = -1):
    """Resume the DTAM alternation from full (d, a, q, theta, n) state for
    ``iterations`` steps — the reference's per-frame schedule verbatim
    (main.cpp:368-383: 5 iterations per frame, theta *= (1 - beta*n) with
    the GLOBAL counter n, state persisting across frames). Returns the
    advanced (d, a, q, theta, n).

    Engine: the XLA fori_loop — fastest AND the only compiled-correct
    route on TPU (see dtam_solve's docstring; the Pallas twin's compiled
    lowering diverges from its interpret-mode semantics)."""

    def body(i, carry):
        d_, a_, q_, theta_, n_ = carry
        q_ = rof.weighted_huber_dual_ascent_p(q_, d_, g, sigma_q, huber_alpha)
        d_ = rof.weighted_l2_primal_descent(d_, q_, a_, g, sigma_d,
                                            1.0 / theta_)
        # pure-XLA sweep on purpose — see dtam_solve's body
        a_ = cv.cost_vol_minimum_square_penalty_subpix(vol, d_, lam,
                                                       theta_, sd)
        theta_ = theta_ * (1.0 - beta * n_)
        n_ = n_ + 1.0
        return (d_, a_, q_, theta_, n_)

    return jax.lax.fori_loop(
        0, iterations, body,
        (d, a, q, jnp.asarray(theta, jnp.float32),
         jnp.asarray(n, jnp.float32)))


def dtam_frame(left, right, state, cfg: StereoConfig, iterations: int = 5):
    """One incremental DTAM frame (jit-compatible): preprocess + census
    volume + ``iterations`` alternation steps resumed from ``state`` +
    median/LR postprocess — exactly the reference app's per-frame work
    (main.cpp:280-383,457-474), with the solver state persisting across
    frames instead of a cold re-solve. ``state`` is (d, a, q, theta, n) or
    None (dtam_reset: WTA-subpix init, main.cpp:354-365). Returns
    (postprocessed disparity, new state)."""
    left_p = preprocess_intensity(left, cfg)
    right_p = preprocess_intensity(right, cfg)
    vol_l = cost_volume(left_p, right_p, cfg, -1)
    if cfg.filter_volume:
        vol_l = ii.guided_filter_volume(vol_l, left_p, cfg.filter_rad,
                                        cfg.filter_eps)
    g = cv.exponential_edge_weight(left_p, cfg.g_alpha, cfg.g_beta)
    if state is None:
        # pure-XLA init on the reset frame — see dtam_solve's d0 note
        d0 = cv.cost_vol_minimum_subpix(vol_l, -1)
        state = (d0, d0, jnp.zeros(d0.shape + (2,), jnp.float32),
                 jnp.float32(cfg.theta_start), jnp.float32(0.0))
    d, a, q, theta, n = state
    state = dtam_increment(vol_l, g, d, a, q, theta, n, cfg.lam, cfg.sigma_q,
                           cfg.sigma_d, cfg.huber_alpha, cfg.beta,
                           iterations=iterations)
    disp_r = None
    if cfg.lr_check:
        vol_r = cost_volume(left_p, right_p, cfg, 1)
        disp_r = fast.cost_vol_minimum_subpix(vol_r, 1)
    return postprocess(state[0], disp_r, cfg), state


class VariationalStereo:
    """Stateful incremental DTAM stereo driver — the reference app's main
    loop (applications/stereo/main.cpp:280-495) as an object: ``reset()``
    is the dtam_reset branch (WTA init, q = 0, theta/n reset,
    main.cpp:354-365), ``process_frame()`` is the capture branch (census
    volume rebuild from the new pair + 5 alternation iterations while
    theta > min_theta + post filters, main.cpp:368-383,457-474). The
    (d, a, q, theta, n) state persists across frames exactly like the
    reference's imgd/imga/imgq device buffers, so disparity refines
    incrementally at ~5 iterations of cost per frame instead of a cold
    re-solve."""

    def __init__(self, cfg: StereoConfig = StereoConfig(),
                 its_per_frame: int = 5, min_theta: float = 1e-4):
        self.cfg = cfg
        self.its_per_frame = its_per_frame
        self.min_theta = float(min_theta)  # main.cpp:367
        self.state = None
        self.disp = None
        self._jitted = {}  # (iterations, reset?) -> compiled frame

    def reset(self):
        """dtam_reset: the next frame re-initialises from its volume's WTA."""
        self.state = None

    @property
    def theta(self):
        return float(self.state[3]) if self.state is not None else None

    def _frame_fn(self, its: int, fresh: bool):
        """ONE jitted program per (iterations, reset?) — an eager
        dtam_frame is hundreds of per-op dispatches, ~4 s/frame through
        the remote tunnel vs ~2 ms compiled + one ~28 ms round trip."""
        key = (its, fresh)
        fn = self._jitted.get(key)
        if fn is None:
            cfg = self.cfg
            if fresh:
                fn = jax.jit(lambda l, r: dtam_frame(l, r, None, cfg, its))
            else:
                fn = jax.jit(
                    lambda l, r, st: dtam_frame(l, r, st, cfg, its))
            self._jitted[key] = fn
        return fn

    def process_frame(self, left, right):
        """Run one frame; returns the postprocessed disparity."""
        its = self.its_per_frame
        if self.state is not None and float(self.state[3]) <= self.min_theta:
            its = 0  # converged: the reference stops iterating (main.cpp:368)
        if self.state is None:
            self.disp, self.state = self._frame_fn(its, True)(left, right)
        else:
            self.disp, self.state = self._frame_fn(its, False)(
                left, right, self.state)
        return self.disp


def postprocess(disp_l, disp_r, cfg: StereoConfig):
    """Median -> LR check -> gradient filter (main.cpp:457-474)."""
    out = disp_l
    for _ in range(cfg.median_its):
        out = fast.median_filter_reject_invalid(out, cfg.median_max_bad, rad=2)
    if cfg.lr_check and disp_r is not None:
        out = fast.left_right_check(out, disp_r, -1, cfg.max_disp_diff,
                                    max_disp=cfg.max_disp)
    if cfg.filt_grad_thresh > 0:
        out = cv.filter_disp_grad(out, cfg.filt_grad_thresh)
    return out


def stereo_pipeline(left, right, cfg: StereoConfig = StereoConfig(),
                    use_dtam: bool = True, mesh=None):
    """Full frame: preprocess -> volume -> (guided filter) -> WTA or DTAM
    -> post (main.cpp:280-474). Census, the edge weight and the
    trunc-abs-grad costs all see the preprocessed [0,1] (optionally
    zero-mean) intensities, like the reference's img[] pyramid.

    With ``mesh`` the DTAM alternation runs multi-chip with the cost
    volume's disparity axis sharded (parallel/sharding.py
    ``sharded_dtam_solve`` — the image-space half-steps replicate, the
    auxiliary exhaustive sweep is D-parallel); the image-sized front/back
    ends stay replicated like the sibling apps' mesh modes."""
    left_p = preprocess_intensity(left, cfg)
    right_p = preprocess_intensity(right, cfg)
    vol_l = cost_volume(left_p, right_p, cfg, -1)
    if cfg.filter_volume:
        vol_l = ii.guided_filter_volume(vol_l, left_p, cfg.filter_rad,
                                        cfg.filter_eps)
    if use_dtam and mesh is not None:
        from ..parallel import sharding

        disp_l = sharding.sharded_dtam_solve(
            vol_l, left_p, cfg.lam, cfg.theta_start, cfg.sigma_q, cfg.sigma_d,
            cfg.huber_alpha, cfg.beta, cfg.g_alpha, cfg.g_beta, mesh,
            iterations=cfg.dtam_iterations,
        )
    elif use_dtam:
        d_init = None
        if cfg.coarse_init:
            from ..ops import resample as resample_mod

            lh = resample_mod.box_half(left_p)
            rh = resample_mod.box_half(right_p)
            ccfg = dataclasses.replace(cfg, max_disp=max(cfg.max_disp // 2, 8),
                                       coarse_init=False)
            vol_c = cost_volume(lh, rh, ccfg, -1)
            d_c = dtam_solve(
                vol_c, lh, cfg.lam, cfg.theta_start, cfg.sigma_q, cfg.sigma_d,
                cfg.huber_alpha, cfg.beta, cfg.g_alpha, cfg.g_beta,
                iterations=cfg.coarse_iterations,
            )
            H, W = left_p.shape
            d_init = 2.0 * resample_mod.resample(d_c, W, H, "bilinear")
        disp_l = dtam_solve(
            vol_l, left_p, cfg.lam, cfg.theta_start, cfg.sigma_q, cfg.sigma_d,
            cfg.huber_alpha, cfg.beta, cfg.g_alpha, cfg.g_beta,
            iterations=cfg.dtam_iterations, d_init=d_init,
        )
    else:
        disp_l = fast.cost_vol_minimum_subpix(vol_l, -1)
    disp_r = None
    if cfg.lr_check:
        vol_r = cost_volume(left_p, right_p, cfg, 1)
        disp_r = fast.cost_vol_minimum_subpix(vol_r, 1)
    return postprocess(disp_l, disp_r, cfg)


class MultiViewStereo:
    """Multi-frame cost-volume accumulation driver (stereo2/main.cpp:462-486,
    the COSTVOL_TIME mode): anchor a keyframe, project every posed frame into
    its running-mean CostVolElem volume with ``cost_volume_add``
    (cu_dense_stereo.cu:693-731), then extract disparity with WTA or the
    DTAM alternation. Poses are (3, 4) T_wc camera-to-world.
    """

    def __init__(self, K, baseline: float, cfg: StereoConfig = StereoConfig(),
                 rad: int = 1):
        self.K = K
        self.baseline = float(baseline)
        self.cfg = cfg
        self.rad = rad
        self.n = self.s = None
        self.img_v = None
        self.T_wv = None

    def reset(self, img_v, T_wv, right=None):
        """Anchor a new keyframe: ``costvol_reset`` zeroes the accumulator;
        with ``right`` given it seeds from the stereo pair instead
        (``costvol_reset_stereo``, main.cpp:466-477)."""
        H, W = img_v.shape
        self.img_v = img_v
        self.T_wv = jnp.asarray(T_wv)
        if right is None:
            self.n, self.s = cv.cost_volume_zero(self.cfg.max_disp, H, W)
        else:
            # seed with the SAME patch radius add() accumulates with —
            # the running mean must average commensurate SAD magnitudes
            self.n, self.s = cv.cost_volume_from_stereo(
                img_v, right, self.cfg.max_disp, sd=-1, rad=self.rad)

    def add(self, img_c, T_wc):
        """Accumulate one posed frame (``costvol_add``, main.cpp:478-481:
        KT_lv = Kl * (T_wc^-1 * T_wv))."""
        assert self.img_v is not None, "reset() a keyframe first"
        from ..core import se3

        T_cv = se3.compose(se3.inverse(jnp.asarray(T_wc)), self.T_wv)
        KT_cv = jnp.asarray(self.K.matrix()) @ T_cv
        self.n, self.s = cv.cost_volume_add(
            self.n, self.s, self.img_v, img_c, KT_cv, self.K, self.baseline,
            rad=self.rad)
        return self.n, self.s

    def solve(self, use_dtam: bool = True):
        """Extract disparity from the accumulated volume (the reference's
        CostVolMinimum extraction at main.cpp:484; DTAM regularisation on
        the multiview volume is the stereo/main.cpp:354-383 alternation)."""
        vol = cv.cost_elem_to_float(self.n, self.s)
        # normalise to the DTAM solver's expected cost scale: the SAD sums
        # are in [0, 255]-intensity units over the patch
        vol = jnp.clip(vol / 255.0, 0.0, 1e6)
        if use_dtam:
            cfg = self.cfg
            return dtam_solve(
                vol, self.img_v, cfg.lam, cfg.theta_start, cfg.sigma_q,
                cfg.sigma_d, cfg.huber_alpha, cfg.beta, cfg.g_alpha,
                cfg.g_beta, iterations=cfg.dtam_iterations)
        return fast.cost_vol_minimum_subpix(vol, -1)


def depth_and_cloud(disp, K, baseline, min_disp=16.0):
    """Disp2Depth + DisparityImageToVbo (main.cpp:384-419)."""
    depth = depth_mod.disp_to_depth(disp, K.fu, baseline, min_disp)
    cloud = depth_mod.depth_from_disparity_vbo(disp, K, baseline, min_disp)
    return depth, cloud


def export_depthmap(out_dir, disp, left_img, fu, baseline, frame=0,
                    timestamp=None, min_disp=0.0):
    """The stereo app's save_depthmaps block (stereo/main.cpp:384-419):
    Disp2Depth on the converged disparity, written as SDepth-<index>.pdm
    (binary "P7" raw float32) beside the grey Left-<index>.pgm. The index
    is the %05d frame counter, or the %015.10f capture timestamp when a
    timestamp is given (the -export_time flag). Returns the two paths."""
    import os

    import numpy as np

    from ..geometry import depth as depth_mod_
    from ..io import pxm

    index = (f"{timestamp:015.10f}" if timestamp is not None
             else f"{int(frame):05d}")
    depth = np.asarray(depth_mod_.disp_to_depth(disp, fu, baseline, min_disp))
    dpath = os.path.join(out_dir, f"SDepth-{index}.pdm")
    gpath = os.path.join(out_dir, f"Left-{index}.pgm")
    pxm.save_pdm(dpath, depth)
    grey = np.asarray(left_img)
    if grey.dtype != np.uint8:
        grey = np.clip(grey, 0, 255).astype(np.uint8)
    pxm.save_pxm(gpath, grey)
    return dpath, gpath
