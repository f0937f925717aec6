"""SGM stereo pipeline + the stereo2 app tail.

TPU-native re-implementation of applications/stereo2/main.cpp:374-536:
census volumes (both directions for the LR check) -> 4-path semi-global
matching -> WTA + subpixel -> median / LR-check (``sgm_pipeline``), then the
app tail (``Stereo2App``): DisparityImageToVbo, the iterated PlaneFitGN
ground-plane estimate (main.cpp:505-519) and HeightmapFusion
(main.cpp:182-194, 524-536). Var defaults from stereo2/main.cpp:240-261.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..stereo import census as census_mod
from ..stereo import costvolume as cv
from ..stereo import dispatch as fast


def _check_mesh_cfg(cfg):
    """Fail fast on SgmConfig features the sharded aggregation lacks."""
    if not (cfg.do_horiz and cfg.do_vert and cfg.do_reverse):
        raise ValueError("mesh-parallel SGM runs the full path set — "
                         "per-direction flags are single-device only")
    if cfg.lr_check and not cfg.lr_from_left:
        raise ValueError("mesh-parallel SGM requires lr_from_left "
                         "(or lr_check=False)")


def _intensity(img):
    """Intensity image on the reference's scale for SGM's adaptive-P2 edge
    term P2' = P2/(1+|dI|): the app converts uchar to [0,1] float
    (ElementwiseScaleBias 1/255, stereo2/main.cpp:376), so |dI| <= 1.
    Integer inputs scale by 1/255; float inputs are assumed already on
    that scale."""
    f = img.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(img).dtype, jnp.integer):
        f = f / 255.0
    return f


def _filter_volume(vol, guide, cfg: "SgmConfig"):
    """Pre-aggregation cost-volume filtering (stereo2/main.cpp:391-421):
    guided filter per slice, then the 3-weight cross bilateral."""
    if cfg.guided_filter:
        from ..ops import integral_image as ii

        vol = ii.guided_filter_volume(vol, guide, cfg.filter_rad,
                                      cfg.filter_eps)
    if cfg.bilateral_filter:
        from ..ops import bilateral as bf

        vol = bf.bilateral_volume(vol, guide, cfg.bilateral_gs,
                                  cfg.bilateral_gr, cfg.bilateral_size,
                                  gc=cfg.bilateral_gc)
    return vol


@dataclasses.dataclass
class SgmConfig:
    max_disp: int = 64
    census_window: str = "16x16"
    p1: float = 0.01  # ui.sgm p1
    p2: float = 0.02  # ui.sgm p2 (adaptive P2/(1+|dI|))
    do_horiz: bool = True
    do_vert: bool = True
    do_reverse: bool = True
    # 8-path aggregation (adds the four diagonals; the reference stops at 4 —
    # SURVEY.md §7.4's "keep a flag for 8")
    do_diagonal: bool = False
    lr_check: bool = True
    max_disp_diff: float = 1.0
    median_its: int = 1
    median_max_bad: int = 12
    subpix: bool = True
    # pre-aggregation cost-volume filtering (stereo2/main.cpp:391-421):
    # ui.filter (guided filter, rad 9 / eps 1e-4) and ui."Apply Bilateral
    # Filter" (per-slice 3-weight cross bilateral, win 18 / gs 10 / gr 6 /
    # gc 0.01). Both default OFF here: the benchmarked headline is the
    # unfiltered pipeline, and the reference app (not in its build) ships
    # ui.filter=true only as a live toggle. Either filter keeps the volume
    # f32 (their arithmetic is not exactly representable in bf16).
    guided_filter: bool = False
    filter_rad: int = 9  # ui.radius
    filter_eps: float = 0.01 * 0.01  # ui.eps
    bilateral_filter: bool = False
    bilateral_size: int = 18  # ui.size
    bilateral_gs: float = 10.0  # ui.gs
    bilateral_gr: float = 6.0  # ui.gr
    bilateral_gc: float = 0.01  # ui.gc
    # derive the right disparity from the LEFT aggregated volume
    # (dispR(x) = argmin_d aggL(d, y, x+d), a free per-d lane roll) instead
    # of building + aggregating a second volume — ~1.6x faster end-to-end
    # and standard SGM practice (OpenCV does the same). Note the reference's
    # SGM loop only ever aggregates vol[0] (`for(i=0;i<1;++i)`,
    # stereo2/main.cpp:424-428), so its disp[1] comes from the UNaggregated
    # right volume; both settings here are stricter than that — True
    # re-anchors the aggregated left volume, False aggregates the right
    # volume independently. See docs/PARITY.md.
    lr_from_left: bool = True


def sgm_pipeline(left, right, cfg: SgmConfig = SgmConfig(), mesh=None):
    """Full SGM frame for the left image; returns float disparity with NaN
    invalids (stereo2/main.cpp:374-436).

    ``mesh`` (a jax.sharding.Mesh) runs the aggregation — the dominant
    frame cost — multi-chip: the reshard strategy for 4-path
    (column-sharded vertical scans, one all_to_all, row-sharded horizontal
    — exact recurrences, parallel.sharding), or the ppermute carry
    wavefront for 8-path. The image-sized stages (census, WTA, median, LR
    check) stay replicated; they are a fraction of the frame. Requires the
    default full path set and ``lr_from_left`` (the sharded ops have no
    per-direction flags; the roll re-anchor avoids a second aggregation).
    """
    if mesh is not None:
        _check_mesh_cfg(cfg)
        n = mesh.devices.size
        if left.shape[0] % n or left.shape[1] % n:
            raise ValueError("the mesh size must divide image H and W "
                             "(sharded SGM reshards between both axes)")
        from ..parallel import sharding as _sh
    cl = census_mod.census(left, cfg.census_window)
    cr = census_mod.census(right, cfg.census_window)
    bits = census_mod.norm_bits(cfg.census_window)
    left_f = _intensity(left)
    right_f = _intensity(right)
    # power-of-two normalisers make every cost k/bits exact in bfloat16, so
    # the half-bandwidth volume aggregates bit-identically (census.py);
    # the volume filters' arithmetic is not bf16-exact, so they keep f32
    vol_dtype = (jnp.float32 if cfg.guided_filter or cfg.bilateral_filter
                 else jnp.bfloat16 if bits & (bits - 1) == 0 else jnp.float32)

    vol_l = census_mod.census_cost_volume(cl, cr, cfg.max_disp, -1, bits,
                                          dtype=vol_dtype)
    vol_l = _filter_volume(vol_l, left_f, cfg)
    if mesh is not None:
        if cfg.do_diagonal:
            agg_l = _sh.sharded_semi_global_matching(
                vol_l, left_f, cfg.p1, cfg.p2, mesh, do_diagonal=True)
        else:
            agg_l = _sh.sharded_semi_global_matching_reshard(
                vol_l, left_f, cfg.p1, cfg.p2, mesh)
        # the tail consumes the aggregation's row shards directly: WTA,
        # the lane-roll right re-anchor and the LR checks are row-local,
        # and the medians halo-exchange 2 rows — so the full-volume
        # all_gather a replicated tail would pay never happens; only the
        # final (H, W) disparity image is replicated (~D x cheaper).
        disp = _sh.sharded_sgm_tail(
            agg_l, mesh, cfg.max_disp, subpix=cfg.subpix,
            lr_check=cfg.lr_check, max_disp_diff=cfg.max_disp_diff,
            median_its=cfg.median_its, median_max_bad=cfg.median_max_bad)
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(disp, NamedSharding(mesh, PartitionSpec()))
    else:
        agg_l = fast.semi_global_matching(
            vol_l, left_f, cfg.p1, cfg.p2, cfg.do_horiz, cfg.do_vert,
            cfg.do_reverse, cfg.do_diagonal,
        )
    if cfg.subpix:
        disp_l = fast.cost_vol_minimum_subpix(agg_l, -1)
    else:
        disp_l = cv.cost_vol_minimum(agg_l, cfg.max_disp).astype(jnp.float32)

    if cfg.lr_check:
        if cfg.lr_from_left:
            # re-anchor the left aggregation on the right grid with lane
            # rolls (cv.reanchor_right docstring has the wrap/mask argument;
            # 0.026 ms vs the 2.3 ms second census+aggregation it replaces)
            agg_r = cv.reanchor_right(agg_l)
        else:
            vol_r = census_mod.census_cost_volume(cr, cl, cfg.max_disp, 1, bits,
                                                  dtype=vol_dtype)
            vol_r = _filter_volume(vol_r, right_f, cfg)
            agg_r = fast.semi_global_matching(
                vol_r, right_f, cfg.p1, cfg.p2, cfg.do_horiz, cfg.do_vert,
                cfg.do_reverse, cfg.do_diagonal, sd=1,
            )
        if cfg.subpix:
            disp_r = fast.cost_vol_minimum_subpix(agg_r, 1)
        else:
            disp_r = cv.cost_vol_minimum(agg_r, cfg.max_disp).astype(jnp.float32)

    # median both disparity images before the LR check, like the reference's
    # `for(di=0; di<(leftrightcheck?2:1); ++di)` loop (stereo2/main.cpp:438-445)
    for _ in range(cfg.median_its):
        disp_l = fast.median_filter_reject_invalid(disp_l, cfg.median_max_bad, rad=2)
        if cfg.lr_check:
            disp_r = fast.median_filter_reject_invalid(disp_r, cfg.median_max_bad, rad=2)
    if cfg.lr_check:
        # both directions, in reference order (stereo2/main.cpp:452-455):
        # disp_r is masked against disp_l first, so the second check also
        # rejects left pixels whose right partner just got invalidated.
        disp_r = fast.left_right_check(disp_r, disp_l, 1, cfg.max_disp_diff,
                                       max_disp=cfg.max_disp)
        disp_l = fast.left_right_check(disp_l, disp_r, -1, cfg.max_disp_diff,
                                       max_disp=cfg.max_disp)
    return disp_l


def sgm_pipeline_batched(lefts, rights, cfg: SgmConfig = SgmConfig()):
    """Offline-throughput SGM over a frame batch on ONE chip.

    Frames stack along the row axis and aggregate in a SINGLE streaming
    Pallas pass with paths re-seeded at every frame seam (sgm_pallas
    ``seam_period``). Vertical paths re-seed at seams; horizontal paths
    and the WTA / re-anchor / LR stages are row-independent and run
    stacked; the 5x5 median (a row stencil) runs per frame. 4-path only.
    Returns (B, H, W) disparity; falls back to a per-frame loop off-TPU.

    Measured on the v5e (docs/PERF.md): one-chip batching is ~linear in B
    whichever way it is expressed — the per-frame kernels already fill the
    chip — so this mode buys one dispatch per batch, not throughput;
    throughput scaling comes from more chips
    (parallel.batch.frame_parallel). Stacking (13.6 ms at B=4) slightly
    beats vmapping the pipeline (14.4 ms) and matches B independent
    per-frame subgraphs in one jit (12.6 ms by device trace).
    """
    from .. import backend
    from ..stereo import sgm_pallas as sp

    B, H, W = lefts.shape
    from ..stereo import dispatch as _dispatch

    # seam re-seeding needs H to be a step multiple, and the stacked
    # (D, B*H, W) volume must fit the kernels on BOTH scan axes
    # (sgm_shapes_ok) or the per-frame pipeline's XLA fallback is the
    # correct path.
    if not backend.use_pallas(
            H % sp.ROWS_PER_STEP == 0
            and _dispatch.sgm_shapes_ok((cfg.max_disp, B * H, W))
            and not cfg.do_diagonal and cfg.lr_from_left
            # the volume filters are image-window stencils that must not
            # read across frame seams — per-frame pipeline handles them
            and not cfg.guided_filter and not cfg.bilateral_filter):
        return jnp.stack([sgm_pipeline(lefts[k], rights[k], cfg)
                          for k in range(B)])

    bits = census_mod.norm_bits(cfg.census_window)
    vol_dtype = jnp.bfloat16 if bits & (bits - 1) == 0 else jnp.float32
    # census runs per frame (its window stencil must not read across frame
    # seams), but the cost volume builds directly on the STACKED census
    # images: the per-disparity shift is a lane roll along x, row-local, so
    # stacking along rows is transparent — no (D, B*H, W) volume concat.
    cls, crs = [], []
    for k in range(B):
        cls.append(census_mod.census(lefts[k], cfg.census_window))
        crs.append(census_mod.census(rights[k], cfg.census_window))
    cl_s = jnp.concatenate(cls, axis=0)
    cr_s = jnp.concatenate(crs, axis=0)
    vol_s = census_mod.census_cost_volume(cl_s, cr_s, cfg.max_disp, -1,
                                          bits, dtype=vol_dtype)
    img_s = _intensity(lefts.reshape(B * H, W))
    agg_l = sp.semi_global_matching(vol_s, img_s, cfg.p1, cfg.p2,
                                    cfg.do_horiz, cfg.do_vert,
                                    cfg.do_reverse, seam_period=H)
    if cfg.subpix:
        disp_l = fast.cost_vol_minimum_subpix(agg_l, -1)
    else:
        disp_l = cv.cost_vol_minimum(agg_l, cfg.max_disp).astype(jnp.float32)
    if cfg.lr_check:
        agg_r = cv.reanchor_right(agg_l)
        if cfg.subpix:
            disp_r = fast.cost_vol_minimum_subpix(agg_r, 1)
        else:
            disp_r = cv.cost_vol_minimum(agg_r, cfg.max_disp).astype(jnp.float32)

    def median_per_frame(d2):
        # the 5x5 stencil must not read across frame seams
        return jnp.concatenate(
            [fast.median_filter_reject_invalid(d2[k * H:(k + 1) * H],
                                               cfg.median_max_bad, rad=2)
             for k in range(B)], axis=0)

    for _ in range(cfg.median_its):
        disp_l = median_per_frame(disp_l)
        if cfg.lr_check:
            disp_r = median_per_frame(disp_r)
    if cfg.lr_check:
        disp_r = fast.left_right_check(disp_r, disp_l, 1, cfg.max_disp_diff,
                                       max_disp=cfg.max_disp)
        disp_l = fast.left_right_check(disp_l, disp_r, -1, cfg.max_disp_diff,
                                       max_disp=cfg.max_disp)
    return disp_l.reshape(B, H, W)


class Stereo2App:
    """Stateful stereo2 driver: SGM disparity + the app tail
    (stereo2/main.cpp:374-536).

    Per frame: ``sgm_pipeline`` -> DisparityImageToVbo (main.cpp:503) ->
    5 PlaneFitGN Gauss-Newton steps continuing the persistent plane estimate
    (main.cpp:505-519; the first frame runs the reference's resetPlane
    105-step schedule) -> HeightmapFusion of the world-frame cloud
    (main.cpp:532-536). The heightmap grid pose is initialised from the
    first fitted plane exactly like resetPlane: T_nw =
    PlaneBasis_wp(n_c)^-1 * T_wc^-1 with the grid centre offset
    (main.cpp:524-528).
    """

    def __init__(self, K, baseline: float, cfg: SgmConfig = SgmConfig(),
                 plane_fit: bool = True, heightmap: bool = True,
                 hm_size=(10.0, 10.0), hm_cell: float = 0.1,
                 min_disp: float = 1.0, plane_c: float = 0.5,
                 plane_within: float = 20.0, mesh=None):
        from ..geometry.heightmap import HeightmapFusion

        self.K = K
        self.baseline = float(baseline)
        self.cfg = cfg
        self.mesh = mesh  # multi-chip aggregation (sgm_pipeline mesh=)
        if mesh is not None:
            _check_mesh_cfg(cfg)  # fail at construction, not first frame
        self.do_plane = plane_fit
        self.do_heightmap = heightmap
        self.min_disp = min_disp
        self.plane_c = plane_c          # ui.Plane c (main.cpp:267)
        self.plane_within = plane_within  # ui.Plane Within (main.cpp:266)
        self.z = None            # persistent plane parameters (ui z state)
        self.n_c = None          # camera-frame plane normal, n . P = -1
        self.Qinv = None
        self.hm = HeightmapFusion(hm_size[0], hm_size[1], hm_cell) \
            if heightmap else None
        self._hm_init = False

    def _fit_plane(self, d3d, reset: bool):
        from ..solvers import plane_fit as pf

        if self.Qinv is None:
            H, W = d3d.shape[:2]
            self.Qinv = pf.make_q_inv(self.K, W, H)
        if reset:
            # The reference's resetPlane runs 105 GN steps at one fixed c
            # from the fixed initial plane (z = 1/5, main.cpp:132) — whose
            # Tukey basin misses scenes at other depths; the app relies on
            # interactive slider nudging there (PARITY deviation 14). We
            # anneal c over the same 105-step budget so the reset captures
            # the dominant plane from any plausible depth, then the steady
            # 5-step refinement runs at plane_c exactly like main.cpp:508.
            for cc, its in ((16 * self.plane_c, 35), (4 * self.plane_c, 35),
                            (self.plane_c, 35)):
                self.n_c, self.z = pf.fit_plane(
                    d3d, self.Qinv, z0=self.z, iterations=its,
                    zmax=self.plane_within, c=cc)
        else:
            self.n_c, self.z = pf.fit_plane(
                d3d, self.Qinv, z0=self.z, iterations=5,
                zmax=self.plane_within, c=self.plane_c)

    def __call__(self, left, right, T_wc=None, image=None):
        """Process one rectified frame; returns ``(disp, d3d)``. The plane
        fit lands in ``self.n_c``/``self.z`` and the heightmap state in
        ``self.hm`` (mutable, like the reference app's globals).

        ``T_wc`` is the camera pose feeding the heightmap (main.cpp tracks
        it from Vicon/file; defaults to identity); ``image`` optionally
        colours the heightmap cells.
        """
        from ..core import se3
        from ..geometry import depth as depth_mod
        from ..solvers.plane_fit import plane_basis_wp

        if T_wc is None:
            T_wc = jnp.asarray(se3.identity())
        disp = sgm_pipeline(left, right, self.cfg, mesh=self.mesh)
        d3d = depth_mod.depth_from_disparity_vbo(
            disp, self.K, self.baseline, min_disp=self.min_disp)
        if self.do_plane:
            # resetPlane runs the 105-step (annealed) schedule on the first
            # frame, steady state 5 steps (main.cpp:508)
            self._fit_plane(d3d, reset=self.z is None)
        if self.do_heightmap:
            if not self._hm_init:
                if self.n_c is not None:
                    import numpy as np

                    # reference: T_nw = PlaneBasis_wp(n_c)^-1 * T_wc^-1
                    # = (T_wc * T_cp)^-1  (main.cpp:525)
                    T_wp = se3.compose(jnp.asarray(T_wc),
                                       plane_basis_wp(self.n_c))
                    T_nw = np.array(se3.inverse(T_wp))
                    # centre the grid like main.cpp:527 (center_y = false)
                    T_nw[0, 3] += self.hm.w * self.hm.cell_size / 2
                    T_nw[1, 3] += self.hm.h * self.hm.cell_size
                    self.hm = type(self.hm)(
                        self.hm.w * self.hm.cell_size,
                        self.hm.h * self.hm.cell_size,
                        self.hm.cell_size, T_hw=T_nw)
                self._hm_init = True
            pts_w = jnp.concatenate(
                [se3.transform(jnp.asarray(T_wc), d3d[..., :3]),
                 d3d[..., 3:4]], axis=-1)
            self.hm.fuse(pts_w, image)
        return disp, d3d
