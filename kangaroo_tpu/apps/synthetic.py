"""Synthetic scene generation for the application drivers and benchmarks.

The reference apps read live cameras through HAL (extra/RpgCameraOpen.h);
this framework's drivers also accept any array sequence, and this module
supplies analytic stand-ins: raycast depth sequences of a known SDF scene for
KinectFusion, and textured stereo pairs with ground-truth disparity for the
stereo pipelines — the same strategy as the reference's synthetic self-tests
(applications/examples/SdfFusion.cpp).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import kangaroo_tpu as kt
from ..core import se3
from ..fusion import raycast as rc


def sphere_scene(res: int = 128, extent: float = 1.2):
    """Three-sphere TSDF scene with full 6-dof observability."""
    bbox = kt.BoundingBox.create((-extent,) * 3, (extent,) * 3)
    vol = kt.TsdfVolume.create(res, res, res, bbox, trunc_dist=0.1)
    pos = vol.voxel_positions()
    d1 = jnp.linalg.norm(pos - jnp.array([0.25, 0.0, 0.0]), axis=-1) - 0.6
    d2 = jnp.linalg.norm(pos - jnp.array([-0.45, 0.35, 0.3]), axis=-1) - 0.4
    d3 = jnp.linalg.norm(pos - jnp.array([-0.2, -0.5, -0.3]), axis=-1) - 0.3
    val = jnp.minimum(jnp.minimum(d1, d2), d3)
    return kt.TsdfVolume(val, jnp.ones_like(vol.weight), bbox)


def orbit_pose(angle: float, radius: float = 3.0):
    """Camera on a y-axis orbit looking at the origin."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = R @ np.array([0.0, 0.0, -radius], np.float32)
    return se3.make(R, t)


def depth_sequence(n_frames: int, K, w: int, h: int, scene=None,
                   step: float = 0.02, radius: float = 3.0):
    """Yield (T_wc, depth) frames orbiting the scene."""
    vol = sphere_scene() if scene is None else scene
    for i in range(n_frames):
        T_wc = orbit_pose(i * step, radius)
        depth, _, _ = rc.raycast_sdf(vol, T_wc, K, w, h, near=0.5, far=8.0)
        yield jnp.asarray(T_wc), depth


def stereo_pair(w: int = 640, h: int = 480, max_disp: int = 64, seed: int = 0):
    """Textured fronto-parallel-slab stereo pair with ground-truth disparity.

    Returns (left, right, gt_disp) with left uint8; disparity is piecewise
    constant (a box floating over a background plane).
    """
    rng = np.random.default_rng(seed)
    # smooth texture: low-frequency noise + speckle so census has signal
    tex = rng.random((h, w + max_disp)).astype(np.float32)
    k = np.ones(7, np.float32) / 7.0
    for axis in (0, 1):
        tex = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), axis, tex)
    tex = tex + 0.35 * rng.random((h, w + max_disp)).astype(np.float32)
    tex = (255 * (tex - tex.min()) / (tex.max() - tex.min())).astype(np.uint8)

    disp = np.full((h, w), max_disp // 4, np.int32)
    bw, bh = w // 3, h // 3
    disp[bh : 2 * bh, bw : 2 * bw] = (3 * max_disp) // 4

    # disparity is defined on the left grid: left[x] = right[x - d(x)], so the
    # right image is a plain slice and the left samples tex at x + D - d
    right = tex[:, max_disp : max_disp + w]
    xs = np.arange(w)[None, :] + max_disp - disp
    left = tex[np.arange(h)[:, None], xs]
    return (
        jnp.asarray(left.astype(np.uint8)),
        jnp.asarray(right),
        jnp.asarray(disp.astype(np.float32)),
    )


def multiview_track(w: int = 320, h: int = 240, max_disp: int = 32,
                    fractions=(0.5, 0.75, 1.0), baseline: float = 0.1,
                    seed: int = 0):
    """Posed lateral camera track over the stereo_pair scene, for the
    multiview cost-volume accumulation driver (stereo2/main.cpp:462-486).

    The keyframe is the ``stereo_pair`` left image at the identity pose; the
    view at fraction f sits at x = f*baseline and sees the scene with
    disparity f*d relative to the keyframe (f=1 is exactly the right
    image). Returns (keyframe, gt_disp, [(img_f, T_wc_f), ...]). Views are
    exact where (1-f)*d is integral and locally constant (away from the
    box edges), like the base pair.
    """
    from ..core import se3

    rng = np.random.default_rng(seed)
    tex = rng.random((h, w + max_disp)).astype(np.float32)
    k = np.ones(7, np.float32) / 7.0
    for axis in (0, 1):
        tex = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), axis, tex)
    tex = tex + 0.35 * rng.random((h, w + max_disp)).astype(np.float32)
    tex = (255 * (tex - tex.min()) / (tex.max() - tex.min())).astype(np.uint8)

    disp = np.full((h, w), max_disp // 4, np.int32)
    bw, bh = w // 3, h // 3
    disp[bh : 2 * bh, bw : 2 * bw] = (3 * max_disp) // 4

    rows = np.arange(h)[:, None]

    def view(f):
        shift = np.rint((1.0 - f) * disp).astype(np.int64)
        xs = np.clip(np.arange(w)[None, :] + max_disp - shift, 0, w + max_disp - 1)
        return jnp.asarray(tex[rows, xs])

    keyframe = view(0.0)  # the stereo_pair left image
    track = [
        (view(f), jnp.asarray(se3.make(np.eye(3), [f * baseline, 0.0, 0.0])))
        for f in fractions
    ]
    return keyframe, jnp.asarray(disp.astype(np.float32)), track


def kinect_noise(depth, seed: int = 0, sigma0: float = 0.0012,
                 sigma1: float = 0.0019, dropout: float = 0.07,
                 quantize: bool = True, f: float = 580.0,
                 baseline: float = 0.075):
    """Kinect-realistic corruption of a clean metric depth image.

    The reference's whole front end exists because live Kinect depth is
    noisy: FilterBadKinectData (src/cu_depth_tools.cu:32-53), the
    minval-masked bilateral (src/cu_bilateral.cu:59-104) and the rmse
    divergence gate (applications/kinectfusion/main.cpp:320-346). This
    models the sensor's three failure modes so system-level robustness is
    measurable on synthetic sequences (bench.py quality_metrics *_noisy):

    - axial noise, quadratic in depth: sigma(z) = sigma0 + sigma1*(z-0.4)^2
      (Nguyen, Izadi & Lovell 2012, "Modeling Kinect sensor noise");
    - disparity quantisation: the sensor measures d = f*b/z on a 1/8-pixel
      lattice, so returned depth is z_q = f*b / (round(8*f*b/z)/8);
    - dropout holes: smoothly-clumped blobs of invalid pixels (NaN),
      covering ~``dropout`` of the image (occlusion shadows / absorbing
      surfaces), plus everything nearer than 0.4 m (the sensor's min
      range, the FilterBadKinectData threshold class).

    Deterministic per ``seed``. Returns float32 with NaN invalid, like the
    driver's input convention.
    """
    rng = np.random.default_rng(seed)
    z = np.asarray(depth, np.float32).copy()
    valid = np.isfinite(z) & (z > 0)
    sig = sigma0 + sigma1 * (z - 0.4) ** 2
    z = z + sig * rng.standard_normal(z.shape).astype(np.float32)
    if quantize:
        fb = f * baseline
        with np.errstate(divide="ignore", invalid="ignore"):
            z = fb / (np.round(8.0 * fb / z) / 8.0)
    # clumped dropout: threshold a box-smoothed noise field at the
    # requested quantile so holes come as blobs, not salt-and-pepper
    field = rng.random(z.shape).astype(np.float32)
    k = np.ones(9, np.float32) / 9.0
    for axis in (0, 1):
        field = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, field)
    if dropout > 0:
        hole = field < np.quantile(field[valid], dropout)
        z[hole] = np.nan
    z[~valid] = np.nan
    z[z < 0.4] = np.nan
    return jnp.asarray(z)


def noisy_stereo_pair(w: int = 640, h: int = 480, max_disp: int = 64,
                      seed: int = 0, sigma: float = 6.0, gain: float = 1.06,
                      offset: float = 4.0):
    """``stereo_pair`` with photometric corruption: independent Gaussian
    pixel noise (sigma grey levels) on each eye plus a gain/offset
    mismatch on the right — the radiometric differences census matching
    exists to survive (census is ordinal, cu_census.cu:18-46). Returns
    (left, right, gt_disp) uint8/uint8/float32."""
    left, right, gt = stereo_pair(w, h, max_disp, seed=seed)
    rng = np.random.default_rng(seed + 1)
    l = np.asarray(left, np.float32) + sigma * rng.standard_normal((h, w))
    r = (gain * np.asarray(right, np.float32) + offset
         + sigma * rng.standard_normal((h, w)))
    to_u8 = lambda a: jnp.asarray(np.clip(a, 0, 255).astype(np.uint8))
    return to_u8(l), to_u8(r), gt
