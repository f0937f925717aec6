"""KinectFusion: dense TSDF SLAM pipeline.

TPU-native re-implementation of applications/kinectfusion/main.cpp:190-360:
depth -> bilateral -> NaN-aware pyramid -> point/normal images; multi-level
projective point-plane ICP against a raycast of the TSDF; TSDF fusion
(+ optional colour); mesh/volume export. The Pangolin Var panel becomes
:class:`KinectFusionConfig`; the GL view becomes offline renders.

The per-frame compute (preprocess, raycast, ICP iterations, fuse) is one
jitted function per stage; ICP's 6x6 solve happens on-device and only the
rmse gate crosses to the host.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import BoundingBox, BoundedVolume, Intrinsics, TsdfVolume
from ..containers import pyramid as pyr_mod
from ..core import se3
from ..fusion import raycast as rc
from ..fusion import sdf as sdf_mod
from ..fusion import separable
from ..geometry import depth as depth_mod
from ..ops import bilateral as bf
from ..solvers import icp as icp_mod
from ..solvers.lss import LSS


@dataclasses.dataclass
class KinectFusionConfig:
    """Defaults mirror the app's pangolin::Vars (kinectfusion/main.cpp:51-163)."""

    w: int = 640
    h: int = 480
    vol_res: int = 256
    vol_extent: float = 1.0  # reset_bb half-extent
    # True places the volume in front of the initial camera like the
    # reference's reset_bb = (-r, -r, knear)..(r, r, knear+2r)
    # (kinectfusion/main.cpp:90-93); False centres it on the origin (the
    # synthetic-orbit convention used by the tests).
    front_volume: bool = False
    max_levels: int = 4
    its: tuple = (1, 0, 2, 3)  # ICP iterations per level, fine -> coarse
    bilateral_size: int = 3  # ui.size
    bilateral_gs: float = 1.5  # ui.gs
    bilateral_gr: float = 0.1  # ui.gr
    bilateral_minval: float = 0.2  # BilateralFilter(..., 0.2) main.cpp:209
    icp_c: float = 0.1  # ui.icp c
    # bounded projective-association window (solvers/icp.py assoc_radius):
    # the per-pixel live-image gather becomes a (2r+1)^2 masked-shift
    # stencil — identical result whenever the match offset is within r
    # pixels at that pyramid level (true during tracking; coarse levels see
    # offsets shrunk 2x per level). None = the reference's exact gather.
    # Applies only to pixel-lattice model paths (guided/exact engines or
    # raycast_downsample); the separable sweep-grid cloud keeps the exact
    # gather, quartered by the depth-only K_live association.
    icp_assoc_radius: int | None = 4
    trunc_dist_factor: float = 2.0  # ui.trunc vol factor
    max_w: float = 1000.0  # ui.max w
    min_cos_theta: float = 0.1  # ui.min cos theta
    max_rmse: float = 0.10  # ui.Max RMSE
    near: float = 0.1  # knear
    far: float = 4.0  # kfar
    # fuse only planes inside the [knear, kfar] frustum — the reference's
    # per-frame ROI crop (main.cpp:345-357 BoundingBox(T_wl, w, h, K, knear,
    # kfar) -> vol.SubBoundingVolume(roi)). The separable engine always
    # clips bit-equally to the camera-visible+depth-bounded plane window;
    # this flag adds the explicit near/far crop on top.
    fuse_roi: bool = True
    motion_prior: float = 0.1 / 0.2  # depthSigma/motionSigma (main.cpp:315-318)
    depth_scale: float = 1.0  # 1/1000 for mm inputs
    # Compute engine for fuse + raycast:
    #   "separable" (default): gather-free plane-sweep factorization
    #     (fusion/separable.py) — fuse+raycast 256^3/VGA in ~12 ms, and the
    #     whole frame (preprocess+raycast+ICP+fuse) compiles into ONE jit.
    #   "guided": nearest-neighbour packed fuse + coarse-to-fine raycast
    #     (round-1 fast paths, staged jits).
    #   "exact": the reference's bilinear fuse + full sphere trace.
    engine: str = "separable"
    # one-jit frame: raycast the model ONCE at full resolution and
    # box-downsample depth for the coarser ICP levels instead of sweeping
    # per level like the reference (main.cpp:280-291). Off by default: the
    # full-res sweep dominates either way and per-level is measured
    # slightly faster at 256^3/VGA (docs/PERF.md).
    raycast_downsample: bool = False
    # moving workspace (fusion/rolling.py, the LocalTileGrid role): roll the
    # volume to follow the camera when it drifts more than
    # moving_threshold_voxels from centre; 0 disables (fixed volume, like
    # the reference app)
    moving_threshold_voxels: int = 0
    moving_lead_m: float = 0.5
    # colour fusion (use_colour, main.cpp:46,355): blend grey intensity into a
    # colour volume and render from it. rgb_focal mirrors ui.RGB focal length;
    # baseline_m is the depth->rgb camera offset (main.cpp:57,100-102).
    use_colour: bool = False
    rgb_focal: float = 535.7
    rgb_baseline_m: float = 0.08


def preprocess_depth(depth_raw, K: Intrinsics, cfg: KinectFusionConfig):
    """ScaleBias -> masked bilateral -> NaN-aware pyramid -> points+normals
    (main.cpp:208-215). Returns (depth_pyr, vbo_pyr, normal_pyr)."""
    meters = depth_raw.astype(jnp.float32) * cfg.depth_scale
    filtered = bf.bilateral_above_min(
        meters, cfg.bilateral_gs, cfg.bilateral_gr, cfg.bilateral_size,
        cfg.bilateral_minval,
    )
    d_pyr = pyr_mod.box_reduce_ignore_invalid(filtered, cfg.max_levels)
    v_pyr = []
    n_pyr = []
    for l, d in enumerate(d_pyr):
        v = depth_mod.depth_to_vbo(d, K.level(l))
        v_pyr.append(v)
        n_pyr.append(depth_mod.normals_from_vbo(v))
    return d_pyr, tuple(v_pyr), tuple(n_pyr)


def raycast_model(vol: TsdfVolume, T_wl, K: Intrinsics, cfg: KinectFusionConfig,
                  levels: Optional[list] = None, trunc: Optional[float] = None,
                  cloud: bool = False):
    """Predicted depth/normal/point pyramids by raycasting the model from the
    current pose estimate (main.cpp:280-291). ``trunc`` must be passed when
    called inside a jit (the default derives it from the volume, which
    traces). ``cloud`` (separable engine only) returns the model as
    sweep-grid camera-space clouds instead of pixel images — skips the
    image-sized NN warp per level, and projective ICP consumes the cloud
    directly (fusion/separable.py raycast docstring)."""
    if trunc is None:
        trunc = cfg.trunc_dist_factor * float(
            np.linalg.norm(np.asarray(vol.voxel_size_units()))
        )
    out_d, out_v, out_n = [], [], []
    for l in range(cfg.max_levels):
        if levels is not None and cfg.its[l] == 0:
            out_d.append(None)
            out_v.append(None)
            out_n.append(None)
            continue
        Kl = K.level(l)
        w_l, h_l = cfg.w >> l, cfg.h >> l
        if cfg.engine == "separable" and cloud:
            d, vbo, n = separable.raycast_sdf_separable(
                vol, T_wl, Kl, w_l, h_l, cfg.near, cfg.far, trunc_dist=trunc,
                shade=False, output="cloud")
            out_d.append(d)
            out_v.append(vbo)
            out_n.append(n)
            continue
        elif cfg.engine == "separable":
            d, n, _ = separable.raycast_sdf_separable(
                vol, T_wl, Kl, w_l, h_l, cfg.near, cfg.far, trunc_dist=trunc,
                shade=False)
        elif cfg.engine == "guided" and w_l % 4 == 0 and h_l % 4 == 0:
            d, n, _ = rc.raycast_sdf_guided(vol, T_wl, Kl, w_l, h_l, cfg.near,
                                            cfg.far, trunc_dist=trunc, subpix=True)
        else:
            d, n, _ = rc.raycast_sdf(vol, T_wl, Kl, w_l, h_l, cfg.near, cfg.far,
                                     trunc_dist=trunc, subpix=True)
        out_d.append(d)
        out_v.append(depth_mod.depth_to_vbo(d, Kl))
        out_n.append(n)
    return out_d, out_v, out_n


def icp_refine(kin_v, ray_v, ray_n, K: Intrinsics, cfg: KinectFusionConfig,
               K_mats=None, assoc_radius: int | None = None,
               gather_bits: bool = True):
    """Multi-level projective point-plane ICP (main.cpp:293-336).

    Returns (T_lp, rmse, tracking_good): the live-from-previous correction,
    applied as T_wl <- T_wl * T_lp^-1. ``K_mats`` (per-level 3x3 arrays)
    must be passed when called inside a jit. The live camera intrinsics
    always ride along so the association gathers only the depth channel
    (solvers/icp.py K_live); ``assoc_radius`` additionally bounds the
    association window — valid only when ray_v lies on the live pixel
    lattice (not the separable raycast's sweep-grid cloud).
    """
    if K_mats is None:
        K_mats = tuple(
            np.asarray(K.level(l).matrix()) for l in range(cfg.max_levels)
        )
    T_lp = jnp.asarray(se3.identity())
    rmse = jnp.zeros(())
    for l in range(cfg.max_levels - 1, -1, -1):
        if cfg.its[l] == 0:
            continue
        Kl = jnp.asarray(K_mats[l])
        K_live = (Kl[0, 0], Kl[1, 1], Kl[0, 2], Kl[1, 2])
        for _ in range(cfg.its[l]):
            KT_lp = Kl @ T_lp
            T_pl = se3.inverse(T_lp)
            s = icp_mod.icp_point_plane(kin_v[l], ray_v[l], ray_n[l], KT_lp,
                                        T_pl, cfg.icp_c,
                                        assoc_radius=assoc_radius,
                                        K_live=K_live,
                                        gather_bits=gather_bits)
            s_prior = LSS(
                s.JTJ + cfg.motion_prior * jnp.eye(6, dtype=jnp.float32),
                s.JTy, s.sqErr, s.obs,
            )
            rmse = s.rmse()
            if l == cfg.max_levels - 1 and cfg.max_levels > 1:
                x = -icp_mod.solve_pose_update(s_prior, rotation_only=True)
            else:
                x = -icp_mod.solve_pose_update(s_prior)
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            T_lp = se3.compose(T_lp, se3.exp(x))
    return T_lp, rmse


def _colour_camera(cfg: KinectFusionConfig):
    """(T_cd, K_rgb): rgb-camera-from-depth transform and intrinsics.
    T_cd = SE3(I, (baseline, 0, 0))^-1 (main.cpp:100-102); the colour fuse
    projects through T_iw = T_cd * T_wl^-1 (main.cpp:355)."""
    T_cd = jnp.asarray(
        se3.inverse(se3.make(np.eye(3), [cfg.rgb_baseline_m, 0.0, 0.0])))
    return T_cd, Intrinsics.centered(cfg.rgb_focal, cfg.w, cfg.h)


def make_frame_step(K: Intrinsics, cfg: KinectFusionConfig, bbox: BoundingBox,
                    trunc_dist: float, mesh=None,
                    sweep_axis: int | str = "auto",
                    gather_bits: bool = True):
    """ONE jitted function for the whole frame (main.cpp:190-360): depth
    preprocess -> model raycast pyramid -> multi-level ICP -> gated pose
    update -> TSDF fuse. Requires the separable engine — its fuse/raycast
    have no big gathers, so XLA compiles the frame without the
    gather-rematerialisation pathology that made whole-frame jits 2.5x
    slower with the gather paths (docs/PERF.md).

    ``mesh`` (a jax.sharding.Mesh) runs the frame model-parallel: the TSDF
    volume shards along voxel z (parallel.sharding.shard_volume_z) and the
    fuse/raycast run as their sharded variants (zero-comm fuse; raycast
    with a one-plane halo + min-depth reduce), while the cheap image-space
    work (bilateral, pyramid, ICP normal equations) computes replicated —
    the volume is where the memory and FLOPs are. Requires
    ``raycast_downsample`` (one full-res sweep; the per-level cloud
    raycast has no sharded counterpart). Note the sharded raycast must
    sweep the sharded z axis, so poses viewing nearly perpendicular to z
    lose the single-device auto-axis fallback (sharding.py
    sharded_raycast_separable docstring).

    Returns step(val, weight, T_wl, depth_raw, first, lo, hi) ->
    (val', weight', T_wl', rmse). ``first`` skips the pose gate (frame 0 or
    the re-seed after a reset fuses unconditionally at the current pose);
    (lo, hi) is the volume bbox (an argument so the moving-workspace roll
    does not retrigger compilation).

    ``sweep_axis`` (0=z, 1=y, 2=x, 'auto') pins the fuse/raycast plane
    sweep to one STATIC axis instead of the per-pose ``lax.switch``. For a
    single dispatch 'auto' is free, but when the step body becomes a
    ``lax.scan``/``fori_loop`` carry (make_sequence_runner) the switch's
    transposed branches leak a transposed volume layout into the loop
    carry and XLA inserts full-volume relayout copies EVERY frame — traced
    at ~14 ms/frame of pure copies at 256^3, 21 ms/frame total vs 6 ms
    standalone; pinning the axis restored scan parity (docs/PERF.md).

    With ``cfg.use_colour`` the step fuses the colour volume in the same
    jit (main.cpp:355 fuses colour in the frame loop too):
    step(val, weight, cval, T_wl, depth_raw, rgb, first, lo, hi) ->
    (val', weight', cval', T_wl', rmse). Composes with ``mesh`` (both
    volumes z-sharded, zero-comm colour fuse).
    """
    del bbox  # bbox now flows through as (lo, hi) arguments
    if mesh is not None:
        if cfg.engine != "separable" or not cfg.raycast_downsample:
            raise ValueError(
                "mesh-parallel frame step requires engine='separable' and "
                "raycast_downsample=True (one sharded full-res sweep)")
        if cfg.vol_res % mesh.devices.size != 0:
            raise ValueError("the mesh size must divide vol_res")
        from ..parallel import sharding as sh
    K_mats = tuple(
        np.asarray(K.level(l).matrix()) for l in range(cfg.max_levels)
    )
    if cfg.use_colour:
        T_cd, K_rgb = _colour_camera(cfg)

    def _body(val, weight, T_wl, depth_raw, first, lo, hi,
              cval=None, rgb=None):
        _, kin_v, kin_n = preprocess_depth(depth_raw, K, cfg)
        vol = TsdfVolume(val, weight, BoundingBox(lo, hi))
        if cfg.engine == "separable" and cfg.raycast_downsample:
            # one full-resolution sweep; coarser ICP levels from NaN-aware
            # box downsampling of the raycast depth
            if mesh is not None:
                d0, _, _ = sh.sharded_raycast_separable(
                    vol, T_wl, K, cfg.w, cfg.h, mesh, near=cfg.near,
                    far=cfg.far, trunc_dist=trunc_dist)
            else:
                d0, _, _ = separable.raycast_sdf_separable(
                    vol, T_wl, K, cfg.w, cfg.h, cfg.near, cfg.far,
                    trunc_dist=trunc_dist, shade=False,
                    sweep_axis=sweep_axis, gather_bits=gather_bits)
            # pin the sweep result: its depth pyramid has 6 consumers (vbo +
            # normals per ICP level) and XLA otherwise rematerialises parts
            # of the 256-plane sweep into them
            d0 = jax.lax.optimization_barrier(d0)
            d_pyr = pyr_mod.box_reduce_ignore_invalid(d0, cfg.max_levels)
            ray_v, ray_n = [], []
            for l in range(cfg.max_levels):
                if cfg.its[l] == 0:
                    ray_v.append(None)
                    ray_n.append(None)
                    continue
                vl = depth_mod.depth_to_vbo(d_pyr[l], K.level(l))
                ray_v.append(vl)
                ray_n.append(depth_mod.normals_from_vbo(vl))
        else:
            _, ray_v, ray_n = raycast_model(vol, T_wl, K, cfg, levels=cfg.its,
                                            trunc=trunc_dist,
                                            cloud=cfg.engine == "separable")
        pixel_lattice = cfg.raycast_downsample or cfg.engine != "separable"
        T_lp, rmse = icp_refine(
            kin_v, ray_v, ray_n, K, cfg, K_mats=K_mats,
            assoc_radius=cfg.icp_assoc_radius if pixel_lattice else None,
            gather_bits=gather_bits)
        good = jnp.isfinite(rmse) & (rmse < cfg.max_rmse)
        T_new = jnp.where(good & ~first,
                          se3.compose(T_wl, se3.inverse(T_lp)), T_wl)
        T_lw = se3.inverse(T_new)
        # the tracking gate rides inside the fuse (zero updates -> exact
        # volume passthrough), saving two volume-sized selects here
        if cfg.use_colour:
            cvol = BoundedVolume(cval, BoundingBox(lo, hi))
            if mesh is not None:
                fusedv, fusedc = sh.sharded_sdf_fuse_color_separable(
                    vol, cvol, kin_v[0][..., 2], kin_n[0], T_lw, K, rgb,
                    se3.compose(T_cd, T_lw), K_rgb, trunc_dist,
                    cfg.max_w, cfg.min_cos_theta, mesh, enable=good | first,
                    near=cfg.near if cfg.fuse_roi else None,
                    far=cfg.far if cfg.fuse_roi else None,
                )
            else:
                fusedv, fusedc = separable.sdf_fuse_color_separable(
                    vol, cvol, kin_v[0][..., 2], kin_n[0], T_lw, K, rgb,
                    se3.compose(T_cd, T_lw), K_rgb, trunc_dist,
                    cfg.max_w, cfg.min_cos_theta, enable=good | first,
                    sweep_axis=sweep_axis, gather_bits=gather_bits,
                    near=cfg.near if cfg.fuse_roi else None,
                    far=cfg.far if cfg.fuse_roi else None,
                )
            return fusedv.val, fusedv.weight, fusedc.data, T_new, rmse
        if mesh is not None:
            fused = sh.sharded_sdf_fuse_separable(
                vol, kin_v[0][..., 2], kin_n[0], T_lw, K, trunc_dist,
                cfg.max_w, cfg.min_cos_theta, mesh, enable=good | first,
                near=cfg.near if cfg.fuse_roi else None,
                far=cfg.far if cfg.fuse_roi else None,
            )
        else:
            fused = separable.sdf_fuse_separable(
                vol, kin_v[0][..., 2], kin_n[0], T_lw, K, trunc_dist,
                cfg.max_w, cfg.min_cos_theta, enable=good | first,
                sweep_axis=sweep_axis, gather_bits=gather_bits,
                near=cfg.near if cfg.fuse_roi else None,
                far=cfg.far if cfg.fuse_roi else None,
            )
        return fused.val, fused.weight, T_new, rmse

    if cfg.use_colour:
        @jax.jit
        def step(val, weight, cval, T_wl, depth_raw, rgb, first, lo, hi):
            return _body(val, weight, T_wl, depth_raw, first, lo, hi,
                         cval=cval, rgb=rgb)
    else:
        @jax.jit
        def step(val, weight, T_wl, depth_raw, first, lo, hi):
            return _body(val, weight, T_wl, depth_raw, first, lo, hi)

    return step


def make_sequence_runner(K: Intrinsics, cfg: KinectFusionConfig,
                         trunc_dist: float, mesh=None,
                         sweep_axis: int | str = 0,
                         gather_bits="fence"):
    """ONE jitted program for a whole recorded depth sequence:
    ``lax.scan`` of :func:`make_frame_step` over stacked frames.

    ``gather_bits="fence"`` (default) routes the association-class
    gathers through the barrier-fenced 16-bit-halves form
    (sampling.take_f32): inside the scan body the un-fenced u16
    intermediates relayout-copy every iteration, so the fenced route wins
    4.14 ms/frame vs 6.06 plain / 6.77 un-fenced bits at 256^3/VGA,
    bit-identical poses. (The standalone frame step keeps plain ``True``
    — un-fenced is 0.4 ms faster there, where the copies pipeline.)

    The reference replays recorded logs through the same per-frame loop
    (kinectfusion/main.cpp:190-360, video mode); on a remote TPU each
    host->device dispatch costs ~28 ms of tunnel round trip — 5x the ~6 ms
    frame compute — so batching the replay into one dispatch is the
    TPU-native throughput mode. Returns
    ``run(val, weight, T_wl, depths, firsts, lo, hi) ->
    (val', weight', T_wl', poses, rmses)`` with ``depths`` (N, H, W),
    ``firsts`` (N,) bool (True skips the pose gate, i.e. frame 0),
    ``poses`` (N, 3, 4) and ``rmses`` (N,) per-frame diagnostics. With
    ``cfg.use_colour`` the runner also scans the colour volume and a
    stacked ``rgbs`` (N, H, W, 3):
    ``run(val, weight, cval, T_wl, depths, rgbs, firsts, lo, hi)``.

    ``sweep_axis`` must be a STATIC axis (0=z default, 1=y, 2=x) — inside
    a scan the per-pose 'auto' ``lax.switch`` leaks a transposed volume
    layout into the loop carry and XLA relayout-copies both volumes every
    frame (~3.5x the frame cost at 256^3; see make_frame_step). Pick the
    dominant view axis of the sequence's poses
    (``fusion.separable._view_axis_index``); when every pose in the
    sequence shares that dominant axis the scan is bit-identical to the
    per-frame 'auto' path. 'auto' is still accepted for callers that need
    per-pose axis selection and accept the copies.
    """
    step = make_frame_step(K, cfg, None, trunc_dist, mesh=mesh,
                           sweep_axis=sweep_axis, gather_bits=gather_bits)

    if cfg.use_colour:
        @jax.jit
        def run(val, weight, cval, T_wl, depths, rgbs, firsts, lo, hi):
            def body(carry, x):
                v, w, c, T = carry
                depth, rgb, first = x
                v, w, c, T, rmse = step(v, w, c, T, depth, rgb, first, lo, hi)
                return (v, w, c, T), (T, rmse)

            (val, weight, cval, T_wl), (poses, rmses) = jax.lax.scan(
                body, (val, weight, cval, T_wl), (depths, rgbs, firsts))
            return val, weight, cval, T_wl, poses, rmses

        return run

    @jax.jit
    def run(val, weight, T_wl, depths, firsts, lo, hi):
        def body(carry, x):
            v, w, T = carry
            depth, first = x
            v, w, T, rmse = step(v, w, T, depth, first, lo, hi)
            return (v, w, T), (T, rmse)

        (val, weight, T_wl), (poses, rmses) = jax.lax.scan(
            body, (val, weight, T_wl), (depths, firsts))
        return val, weight, T_wl, poses, rmses

    return run


class KinectFusion:
    """Stateful driver matching the app's main loop."""

    def __init__(self, K: Intrinsics, cfg: KinectFusionConfig = KinectFusionConfig(),
                 mesh=None):
        """``mesh`` runs the volume ops model-parallel over a
        jax.sharding.Mesh (voxel-z sharded; see make_frame_step). Requires
        the separable engine with raycast_downsample=True."""
        self.K = K
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            if cfg.engine != "separable" or not cfg.raycast_downsample:
                raise ValueError(
                    "mesh-parallel KinectFusion requires engine='separable' "
                    "and raycast_downsample=True")
            if cfg.vol_res % mesh.devices.size != 0:
                raise ValueError("the mesh size must divide vol_res")
        if cfg.front_volume:
            e = cfg.vol_extent
            bb = BoundingBox.create((-e, -e, cfg.near), (e, e, cfg.near + 2 * e))
        else:
            bb = BoundingBox.create((-cfg.vol_extent,) * 3, (cfg.vol_extent,) * 3)
        self.vol, self.color_vol = self._fresh_volumes(bb)
        if cfg.use_colour:
            self.T_cd, self.K_rgb = _colour_camera(cfg)
        self.T_wl = jnp.asarray(se3.identity())
        self.keyframes = []  # (img, K, T_iw) for view-dependent texturing
        self.frame = 0
        self.tracking_good = True
        self.rmse = 0.0
        self._step = None  # lazily-built one-jit frame step (separable)
        self._seq_run = None  # lazily-built whole-sequence scan runner
        self._seq_axis = None  # static sweep axis the runner was built with

    def _fresh_volumes(self, bb, cbb=None, shape=None):
        """(NaN-reset TSDF, 0.5-reset colour volume or None), z-sharded when
        a mesh is set — the SdfReset recipe shared by __init__ and reset()
        (main.cpp:224; cu_sdffusion.cu:166-169). ``shape`` (D, H, W)
        preserves a non-default resolution (e.g. after load_volume);
        default is the config's vol_res cube."""
        cfg = self.cfg
        d, h, w = shape if shape is not None else (cfg.vol_res,) * 3
        vol = TsdfVolume.create(w, h, d, bb, trunc_dist=jnp.nan)
        cvol = None
        if cfg.use_colour:
            cvol = BoundedVolume.create(
                w, h, d, cbb if cbb is not None else bb, fill=0.5)
        if self.mesh is not None:
            from ..parallel import sharding as _sh

            vol = _sh.shard_volume_z(vol, self.mesh)
            if cvol is not None:
                cvol = _sh.shard_bounded_volume_z(cvol, self.mesh)
        return vol, cvol

    @property
    def trunc_dist(self) -> float:
        return self.cfg.trunc_dist_factor * float(
            np.linalg.norm(np.asarray(self.vol.voxel_size_units()))
        )

    def reset(self, T_wl=None):
        """Reset branch of the main loop (main.cpp:224-233): NaN-reset the
        TSDF, SdfReset(colorVol) back to 0.5, identity pose."""
        self.vol, self.color_vol = self._fresh_volumes(
            self.vol.bbox,
            cbb=self.color_vol.bbox if self.color_vol is not None else None,
            shape=self.vol.val.shape)  # preserve a load_volume resolution
        self.T_wl = jnp.asarray(se3.identity() if T_wl is None else T_wl)
        self.keyframes.clear()  # main.cpp:228
        self.frame = 0
        self.tracking_good = True

    def _one_jit_frame(self, depth_raw, rgb=None):
        """Whole-frame path: one compiled computation per frame; only the
        rmse scalar crosses to the host (for the divergence gate). With
        ``cfg.use_colour`` the colour volume fuses in the same jit."""
        colour = self.cfg.use_colour
        if self._step is None:
            self._step = make_frame_step(self.K, self.cfg, self.vol.bbox,
                                         self.trunc_dist, mesh=self.mesh)
        first = jnp.asarray(self.frame == 0)
        lo, hi = self.vol.bbox.lo, self.vol.bbox.hi

        def call(first, lo, hi):
            if colour:
                return self._step(self.vol.val, self.vol.weight,
                                  self.color_vol.data, self.T_wl, depth_raw,
                                  rgb, first, lo, hi)
            out = self._step(self.vol.val, self.vol.weight, self.T_wl,
                             depth_raw, first, lo, hi)
            return out[:2] + (None,) + out[2:]

        val, w, cval, T_new, rmse = call(first, lo, hi)
        self.rmse = float(rmse) if self.frame > 0 else 0.0
        if self.frame > 0 and not np.isfinite(self.rmse):
            # divergence: reset and re-seed from the current frame
            # (main.cpp:224-241), same recipe as the staged path
            self.reset()
            val, w, cval, T_new, _ = call(jnp.asarray(True),
                                          self.vol.bbox.lo, self.vol.bbox.hi)
        else:
            self.tracking_good = self.frame == 0 or self.rmse < self.cfg.max_rmse
        self.vol = TsdfVolume(val, w, self.vol.bbox)
        if colour:
            self.color_vol = BoundedVolume(cval, self.color_vol.bbox)
        self.T_wl = T_new
        self.frame += 1
        return self.T_wl

    def run_sequence(self, depths, rgbs=None):
        """Process a stacked ``(N, H, W)`` recorded depth sequence in ONE
        device dispatch (:func:`make_sequence_runner`); returns per-frame
        ``(poses (N, 3, 4), rmses (N,))`` and leaves the driver state at
        the last frame.

        Semantics vs the per-frame loop: the tracking gate still nulls the
        pose update and the fuse per frame (inside the step), but the
        HOST-side divergence auto-reset and the moving-workspace roll
        cannot fire mid-scan — callers inspect ``rmses`` to detect
        divergence and resume with :meth:`reset`. With ``cfg.use_colour``
        pass stacked ``rgbs`` (N, H, W, 3) and the colour volume scans
        along. Requires the separable engine's one-jit frame step.
        """
        cfg = self.cfg
        if cfg.engine != "separable":
            raise ValueError("run_sequence requires the separable engine's "
                             "one-jit frame step")
        if cfg.use_colour and rgbs is None:
            raise ValueError("use_colour requires stacked rgbs")
        if rgbs is not None and not cfg.use_colour:
            raise ValueError("rgbs passed but the config has "
                             "use_colour=False — they would be ignored")
        depths = jnp.asarray(depths)
        n = depths.shape[0]
        # the scan needs a STATIC sweep axis (make_sequence_runner docstring)
        # — pick the dominant view axis of the seed pose host-side; when the
        # whole sequence keeps that dominant axis (the common case for a
        # replay chunk) this is bit-identical to per-frame 'auto'. The
        # sharded step sweeps the sharded z axis regardless.
        from ..fusion.separable import _view_axis_index

        axis = 0 if self.mesh is not None else int(
            _view_axis_index(se3.inverse(jnp.asarray(self.T_wl))))
        if self._seq_run is None or self._seq_axis != axis:
            self._seq_run = make_sequence_runner(self.K, cfg, self.trunc_dist,
                                                 mesh=self.mesh,
                                                 sweep_axis=axis)
            self._seq_axis = axis
        was_first = self.frame == 0
        firsts = (jnp.arange(n) == 0) & jnp.asarray(was_first)
        if cfg.use_colour:
            val, w, cval, T_wl, poses, rmses = self._seq_run(
                self.vol.val, self.vol.weight, self.color_vol.data,
                self.T_wl, depths, jnp.asarray(rgbs), firsts,
                self.vol.bbox.lo, self.vol.bbox.hi)
            self.color_vol = BoundedVolume(cval, self.color_vol.bbox)
        else:
            val, w, T_wl, poses, rmses = self._seq_run(
                self.vol.val, self.vol.weight, self.T_wl, depths, firsts,
                self.vol.bbox.lo, self.vol.bbox.hi)
        self.vol = TsdfVolume(val, w, self.vol.bbox)
        self.T_wl = T_wl
        self.frame += n
        if was_first and n == 1:
            # frame 0's ICP runs against an empty model; its rmse is
            # meaningless (the per-frame path also reports 0.0 there)
            self.rmse = 0.0
            self.tracking_good = True
        else:
            self.rmse = float(rmses[-1])
            self.tracking_good = bool(np.isfinite(self.rmse)
                                      and self.rmse < cfg.max_rmse)
        return poses, rmses

    def _maybe_roll(self):
        """Moving workspace (LocalTileGrid role): keep the volume around the
        camera by rolling it whole voxels when the drift exceeds the
        hysteresis threshold. Opt-in (costs one host sync per frame)."""
        cfg = self.cfg
        if cfg.moving_threshold_voxels <= 0 or self.frame == 0:
            return
        from ..fusion import rolling

        shift = rolling.recenter_shift(
            self.vol, np.asarray(self.T_wl), lead=cfg.moving_lead_m,
            threshold_voxels=cfg.moving_threshold_voxels)
        if shift == (0, 0, 0):
            return
        self.vol = rolling.roll_volume(self.vol, shift)
        if self.color_vol is not None:
            # the colour volume must follow the same world shift or its
            # voxels are reinterpreted at shifted positions
            self.color_vol = rolling.roll_bounded_volume(self.color_vol,
                                                         shift)

    def process_frame(self, depth_raw, rgb=None, fuse: bool = True,
                      pose_refinement: bool = True):
        """One iteration of the main loop (main.cpp:190-360). ``rgb`` (H, W, 3)
        enables colour fusion when the config has use_colour."""
        cfg = self.cfg
        self._maybe_roll()
        if (cfg.engine == "separable" and fuse and pose_refinement
                and (rgb is None) == (not cfg.use_colour)):
            # one-jit path: depth-only, or colour with an rgb frame (the
            # colour volume fuses inside the same jit)
            return self._one_jit_frame(depth_raw, rgb=rgb)
        _, kin_v, kin_n = preprocess_depth(depth_raw, self.K, cfg)

        if pose_refinement and self.frame > 0:
            _, ray_v, ray_n = raycast_model(self.vol, self.T_wl, self.K, cfg,
                                            levels=cfg.its,
                                            cloud=cfg.engine == "separable")
            pixel_lattice = cfg.raycast_downsample or cfg.engine != "separable"
            T_lp, rmse = icp_refine(
                kin_v, ray_v, ray_n, self.K, cfg,
                assoc_radius=cfg.icp_assoc_radius if pixel_lattice else None)
            self.rmse = float(rmse)
            if not np.isfinite(self.rmse):
                # divergence: reset and fall through to fuse the current
                # frame into the fresh volume, like the app's
                # `if (Pushed(reset) || !isfinite(rmse))` + "Fuse first
                # kinect frame in." (main.cpp:222-241). tracking_good stays
                # True so the fuse below happens and the next frame tracks
                # against the re-seeded model.
                self.reset()
            else:
                self.tracking_good = self.rmse < cfg.max_rmse
                if self.tracking_good:
                    self.T_wl = se3.compose(self.T_wl, se3.inverse(T_lp))

        if fuse and self.tracking_good:
            T_lw = se3.inverse(self.T_wl)
            if cfg.use_colour and rgb is not None:
                # T_iw = T_cd * T_wl^-1 (main.cpp:355)
                T_iw = se3.compose(self.T_cd, T_lw)
                if cfg.engine == "separable":
                    self.vol, self.color_vol = separable.sdf_fuse_color_separable(
                        self.vol, self.color_vol, kin_v[0][..., 2], kin_n[0],
                        T_lw, self.K, rgb, T_iw, self.K_rgb, self.trunc_dist,
                        cfg.max_w, cfg.min_cos_theta,
                        near=cfg.near if cfg.fuse_roi else None,
                        far=cfg.far if cfg.fuse_roi else None,
                    )
                else:
                    self.vol, self.color_vol = sdf_mod.sdf_fuse_color(
                        self.vol, self.color_vol, kin_v[0][..., 2], kin_n[0],
                        T_lw, self.K, rgb, T_iw, self.K_rgb, self.trunc_dist,
                        cfg.max_w, cfg.min_cos_theta,
                    )
            elif cfg.engine == "separable":
                self.vol = separable.sdf_fuse_separable(
                    self.vol, kin_v[0][..., 2], kin_n[0], T_lw, self.K,
                    self.trunc_dist, cfg.max_w, cfg.min_cos_theta,
                    near=cfg.near if cfg.fuse_roi else None,
                    far=cfg.far if cfg.fuse_roi else None,
                )
            else:
                self.vol = sdf_mod.sdf_fuse(
                    self.vol, kin_v[0][..., 2], kin_n[0], T_lw, self.K,
                    self.trunc_dist, cfg.max_w, cfg.min_cos_theta,
                    sample="nearest" if cfg.engine == "guided" else "bilinear",
                )
        self.frame += 1
        return self.T_wl

    def render(self, T_wc=None, level: int = 0, show_colour: bool = False):
        """View-only raycast (main.cpp:244-271); show_colour renders from the
        colour volume (showcolor, main.cpp:283-287)."""
        cfg = self.cfg
        T = self.T_wl if T_wc is None else T_wc
        Kl = self.K.level(level)
        w_l, h_l = cfg.w >> level, cfg.h >> level
        cvol = self.color_vol if (show_colour and cfg.use_colour) else None
        if cfg.engine == "separable" and cvol is None:
            return separable.raycast_sdf_separable(
                self.vol, T, Kl, w_l, h_l, cfg.near, cfg.far,
                trunc_dist=self.trunc_dist)
        if cfg.engine != "exact" and w_l % 4 == 0 and h_l % 4 == 0:
            return rc.raycast_sdf_guided(self.vol, T, Kl, w_l, h_l, cfg.near,
                                         cfg.far, trunc_dist=self.trunc_dist,
                                         color_vol=cvol)
        return rc.raycast_sdf(
            self.vol, T, Kl, w_l, h_l, cfg.near, cfg.far,
            trunc_dist=self.trunc_dist, color_vol=cvol,
        )

    def save_keyframe(self, img, K_kf=None):
        """'ui.Save KF' button (main.cpp:196-200): store the current camera
        image + pose for view-dependent texturing. The keyframe pose is
        T_iw = T_cd * T_wl^-1 (the colour camera's world-to-image transform;
        identity T_cd without a colour rig). ``K_kf`` defaults to the colour
        intrinsics (the reference rebuilds them per render from ui."RGB
        focal length", main.cpp:264)."""
        if K_kf is None:
            K_kf = self.K_rgb if self.cfg.use_colour else self.K
        T_lw = se3.inverse(self.T_wl)
        T_iw = se3.compose(jnp.asarray(self.T_cd), T_lw) \
            if self.cfg.use_colour else T_lw
        self.keyframes.append((jnp.asarray(img), K_kf, jnp.asarray(T_iw)))

    def render_textured(self, T_wc=None, level: int = 0):
        """View-only render textured from the saved keyframes
        (main.cpp:253-270: populate kfs, then TextureDepth over
        Mat<ImageKeyframe,10>): raycast depth/normals/phong, then blend the
        most recent <= 10 keyframes weighted by view alignment, with the
        phong shading where no keyframe sees the surface. Returns
        (depth, normals, rgba)."""
        d, n, phong = self.render(T_wc, level)
        if not self.keyframes:
            rgba = jnp.concatenate(
                [jnp.repeat(phong[..., None], 3, axis=-1),
                 jnp.ones_like(phong)[..., None]], axis=-1)
            return d, n, rgba
        T_wd = self.T_wl if T_wc is None else jnp.asarray(T_wc)
        rgba = depth_mod.texture_depth_keyframes(
            d, n, phong, self.keyframes[-10:], T_wd, self.K.level(level))
        return d, n, rgba

    def save_mesh(self, path: str, method: str = "tet"):
        """'s' key: marching cubes -> mesh file (main.cpp:186-188).

        ``method="tet"`` (default) extracts with marching tetrahedra;
        ``method="mc"`` with the classic per-cube 256-case tables
        (fusion/marching_cubes256.py) — reference-style triangulation
        (MarchingCubes.h:43-144) at ~1/3 the triangle count."""
        from ..fusion import marching_cubes as mc
        from ..fusion import marching_cubes256 as mc256

        vol = TsdfVolume(
            jnp.where(jnp.isfinite(self.vol.val), self.vol.val, self.trunc_dist),
            self.vol.weight, self.vol.bbox,
        )
        tris = (mc256 if method == "mc" else mc).extract_mesh(vol)
        mc.save_ply(path, tris)
        return tris

    def save_volume(self, path: str):
        from ..io import pxm

        pxm.save_tsdf(path, self.vol)

    def load_volume(self, path: str):
        """'l' key: LoadPXM("save.vol", vol) (main.cpp:185)."""
        from ..io import pxm

        self.vol = pxm.load_tsdf(path)
