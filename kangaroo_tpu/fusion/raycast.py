"""SDF raycasting (sphere tracing) + analytic primitives and Phong shading.

TPU-native equivalent of src/cu_raycast.cu. The CUDA kernel runs a divergent
per-pixel while loop; XLA dislikes divergence, so the march is a whole-image
``lax.while_loop``: every live ray advances by max(sdf, voxel) each step and
the loop exits when all rays have hit or left the volume. Trilinear volume
gathers are batched over the full image per step.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..containers.volume import BoundedVolume, TsdfVolume
from ..core import sampling, se3


def phong_shade(p_c, n_c):
    """Phong shading (PhongShade, cu_raycast.cu:14-28)."""
    ambient, diffuse, specular = 0.4, 0.4, 0.2
    eyedir = -p_c / jnp.linalg.norm(p_c, axis=-1, keepdims=True)
    lightdir = jnp.array([0.4, 0.4, -1.0], jnp.float32)
    lightdir = lightdir / jnp.linalg.norm(lightdir)
    ldotn = jnp.sum(lightdir * n_c, axis=-1)
    lightreflect = 2.0 * ldotn[..., None] * n_c - lightdir
    edotr = jnp.maximum(0.0, jnp.sum(eyedir * lightreflect, axis=-1))
    spec = edotr**10
    return ambient + diffuse * ldotn + specular * spec


def _ray_box(bbox, c_w, ray_w, near, far):
    """Williams slab test (cu_raycast.cu:44-51)."""
    tminb = (bbox.lo - c_w) / ray_w
    tmaxb = (bbox.hi - c_w) / ray_w
    tmin = jnp.minimum(tminb, tmaxb)
    tmax = jnp.maximum(tminb, tmaxb)
    max_tmin = jnp.maximum(jnp.max(tmin, axis=-1), near)
    min_tmax = jnp.minimum(jnp.min(tmax, axis=-1), far)
    return max_tmin, min_tmax


class _March(NamedTuple):
    lam: jnp.ndarray
    last_sdf: jnp.ndarray
    last_delta: jnp.ndarray
    depth: jnp.ndarray
    done: jnp.ndarray
    steps: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "subpix", "max_steps", "march_sample",
                     "skip_unobserved"),
)
def raycast_sdf(vol: TsdfVolume, T_wc, K, w: int, h: int, near=0.1, far=10.0,
                trunc_dist=None, subpix: bool = True, max_steps: int = 512,
                color_vol: BoundedVolume | None = None,
                march_sample: str = "trilinear", skip_unobserved: float = 0.0,
                lam_init=None, done_init=None):
    """Raycast the TSDF (RaycastSdf, cu_raycast.cu:34-113; colour overload
    :119-196).

    Returns (depth, normals, img): depth (h, w) with NaN misses; normals
    (h, w, 4) camera-frame with w=1 hit flag; img = Phong shading, or
    trilinear colour samples when ``color_vol`` is given.

    ``march_sample='nearest'`` marches on nearest-neighbour (val, weight)
    fetched with a single packed gather per step instead of the reference's
    8-corner trilinear read (cu_raycast.cu:66) — TPU gathers dominate the
    cost, so this is ~8x faster per step at voxel-quantised accuracy (the
    subpixel zero-crossing interpolation still applies).
    ``skip_unobserved`` > 0 takes steps of that many voxels through never-
    observed space (weight == 0), which cannot contain a surface crossing;
    the reference crawls NaN regions at one voxel per step.
    """
    c_w = se3.translation(T_wc)
    ray_c = K.unproject_grid(w, h)  # (h, w, 3)
    ray_w = se3.rotate(T_wc, ray_c)
    max_tmin, min_tmax = _ray_box(vol.bbox, c_w, ray_w, near, far)
    hit_box = max_tmin < min_tmax
    voxel = vol.voxel_size_units()[0]
    if trunc_dist is None:
        trunc_dist = 2.0 * voxel

    if lam_init is not None:
        lam0 = jnp.maximum(max_tmin, lam_init)
        dead = done_init if done_init is not None else jnp.zeros((h, w), bool)
    else:
        lam0 = max_tmin
        dead = jnp.zeros((h, w), bool)

    init = _March(
        lam=lam0,
        last_sdf=jnp.full((h, w), jnp.nan, jnp.float32),
        last_delta=jnp.zeros((h, w), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        done=(~hit_box) | dead,
        steps=jnp.zeros((), jnp.int32),
    )

    if march_sample == "nearest":
        Dv, Hv, Wv = vol.val.shape
        packed = jnp.stack([vol.val, vol.weight], axis=-1).reshape(-1, 2)
        nvox = jnp.array([Wv - 1, Hv - 1, Dv - 1], jnp.float32)

        def sample_march(pos_w):
            pf = (pos_w - vol.bbox.lo) / vol.bbox.size() * nvox
            ix = jnp.clip(jnp.floor(pf[..., 0] + 0.5), 0, Wv - 1).astype(jnp.int32)
            iy = jnp.clip(jnp.floor(pf[..., 1] + 0.5), 0, Hv - 1).astype(jnp.int32)
            iz = jnp.clip(jnp.floor(pf[..., 2] + 0.5), 0, Dv - 1).astype(jnp.int32)
            got = sampling.take_f32(packed, (iz * Hv + iy) * Wv + ix)
            return got[..., 0], got[..., 1]
    else:
        def sample_march(pos_w):
            return vol.sample_trilinear_world(pos_w), None

    def cond(s: _March):
        return (~jnp.all(s.done)) & (s.steps < max_steps)

    def body(s: _March):
        pos_w = c_w + s.lam[..., None] * ray_w
        sdf, obs_w = sample_march(pos_w)
        crossed = (sdf <= 0) & ~s.done
        surface = crossed & (s.last_sdf > 0)
        if subpix:
            lam_hit = s.lam + s.last_delta * sdf / (s.last_sdf - sdf)
        else:
            lam_hit = s.lam
        depth = jnp.where(surface, lam_hit, s.depth)
        done = s.done | crossed
        # NaN sdf (unobserved voxels after SdfReset(NaN)) marches at the
        # minimum step, matching CUDA fmaxf's NaN-ignoring behaviour.
        delta = jnp.where(jnp.isnan(sdf), voxel, jnp.maximum(sdf, voxel))
        if skip_unobserved > 0 and march_sample == "nearest":
            delta = jnp.where(obs_w <= 0, skip_unobserved * voxel, delta)
        lam = jnp.where(done, s.lam, s.lam + delta)
        done = done | (lam >= min_tmax)
        return _March(
            lam=lam,
            last_sdf=jnp.where(s.done, s.last_sdf, sdf),
            last_delta=jnp.where(s.done, s.last_delta, delta),
            depth=depth,
            done=done,
            steps=s.steps + 1,
        )

    s = jax.lax.while_loop(cond, body, init)
    depth = s.depth

    pos_w = c_w + depth[..., None] * ray_w
    n_w = vol.grad_backward_world(pos_w)
    # pin the gather-heavy gradient result: without this XLA rematerialises
    # the 24-gather normal computation into every downstream consumer
    # (measured 43 ms per extra consumer at 256^3/VGA)
    n_w = jax.lax.optimization_barrier(n_w)
    len_n = jnp.linalg.norm(n_w, axis=-1, keepdims=True)
    n_w = jnp.where(len_n > 0, n_w / jnp.maximum(len_n, 1e-20), jnp.array([0.0, 0.0, 1.0]))
    n_c = se3.rotate_inv(T_wc, n_w)
    hit = depth > 0

    if color_vol is not None:
        img = color_vol.sample_trilinear_world(pos_w)
    else:
        p_c = depth[..., None] * ray_c
        img = phong_shade(p_c, n_c)

    depth_out = jnp.where(hit, depth, jnp.nan)
    img_out = jnp.where(hit, img, 0.0)
    norm_out = jnp.where(
        hit[..., None],
        jnp.concatenate([n_c, jnp.ones((h, w, 1), jnp.float32)], axis=-1),
        0.0,
    )
    return depth_out, norm_out, img_out


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "subpix", "max_steps", "coarse_factor",
                     "fine_steps", "march_sample", "skip_unobserved"),
)
def raycast_sdf_guided(vol: TsdfVolume, T_wc, K, w: int, h: int, near=0.1,
                       far=10.0, trunc_dist=None, subpix: bool = True,
                       max_steps: int = 512, coarse_factor: int = 4,
                       fine_steps: int = 24, march_sample: str = "nearest",
                       skip_unobserved: float = 4.0,
                       color_vol: BoundedVolume | None = None):
    """Coarse-to-fine SDF raycast: march at 1/coarse_factor resolution, then
    start full-resolution rays just in front of the conservative minimum of
    each pixel's coarse neighbourhood and finish in <= fine_steps.

    A TPU-native acceleration (not in the reference): the expensive full-res
    while_loop runs a bounded, short number of gather steps. Pixels whose
    coarse neighbourhood is entirely a miss are declared misses (can clip
    ~1px at silhouettes).
    """
    f = coarse_factor
    Kc = Intrinsics_scale(K, f)
    wc, hc = w // f, h // f
    d_c, _, _ = raycast_sdf(vol, T_wc, Kc, wc, hc, near, far, trunc_dist,
                            subpix=False, max_steps=max_steps,
                            march_sample=march_sample,
                            skip_unobserved=skip_unobserved)
    voxel = vol.voxel_size_units()[0]
    # conservative per-coarse-pixel start: min over the 3x3 neighbourhood
    big = jnp.where(jnp.isfinite(d_c), d_c, jnp.inf)
    p = jnp.pad(big, 1, mode="edge")
    neigh = jnp.stack(
        [p[dy : dy + hc, dx : dx + wc] for dy in range(3) for dx in range(3)], 0
    )
    start_c = jnp.min(neigh, axis=0)
    miss_c = ~jnp.isfinite(start_c)
    start = jnp.repeat(jnp.repeat(start_c, f, axis=0), f, axis=1)[:h, :w]
    dead = jnp.repeat(jnp.repeat(miss_c, f, axis=0), f, axis=1)[:h, :w]
    lam_init = jnp.where(dead, 0.0, start - 6.0 * voxel)
    return raycast_sdf(vol, T_wc, K, w, h, near, far, trunc_dist,
                       subpix=subpix, max_steps=fine_steps,
                       march_sample=march_sample,
                       skip_unobserved=skip_unobserved, color_vol=color_vol,
                       lam_init=lam_init, done_init=dead)


def Intrinsics_scale(K, f: int):
    """Intrinsics for a 1/f-resolution image (matches K.level for power-of-two f)."""
    import math

    l = int(math.log2(f))
    if 2**l == f:
        return K.level(l)
    from ..containers.intrinsics import Intrinsics

    s = 1.0 / f
    return Intrinsics(K.fu * s, K.fv * s, (K.u0 + 0.5) * s - 0.5, (K.v0 + 0.5) * s - 0.5)


@functools.partial(jax.jit, static_argnames=("w", "h"))
def raycast_box(bbox, T_wc, K, w: int, h: int):
    """Depth of the AABB entry point, NaN on miss (RaycastBox,
    cu_raycast.cu:202-240)."""
    c_w = se3.translation(T_wc)
    ray_w = se3.rotate(T_wc, K.unproject_grid(w, h))
    tminb = (bbox.lo - c_w) / ray_w
    tmaxb = (bbox.hi - c_w) / ray_w
    tmin = jnp.minimum(tminb, tmaxb)
    tmax = jnp.maximum(tminb, tmaxb)
    max_tmin = jnp.max(tmin, axis=-1)
    min_tmax = jnp.min(tmax, axis=-1)
    return jnp.where(max_tmin < min_tmax, max_tmin, jnp.nan)


@functools.partial(jax.jit, static_argnames=("w", "h", "shade"))
def raycast_sphere(prev_depth, T_wc, K, center, r, w: int, h: int, shade: bool = True):
    """Analytic sphere depth, z-tested against prev_depth (RaycastSphere,
    cu_raycast.cu:246-278). Returns (depth, shaded_img)."""
    ray_c = K.unproject_grid(w, h)
    center_c = se3.transform_inv(T_wc, jnp.asarray(center, jnp.float32))
    ldotc = jnp.sum(ray_c * center_c, axis=-1)
    lsq = jnp.sum(ray_c * ray_c, axis=-1)
    csq = jnp.dot(center_c, center_c)
    disc = ldotc * ldotc - lsq * (csq - r * r)
    depth = (ldotc - jnp.sqrt(disc)) / lsq
    closer = (depth > 0) & (~(depth >= prev_depth) | ~jnp.isfinite(prev_depth))
    out_depth = jnp.where(closer, depth, prev_depth)
    img = None
    if shade:
        p_c = depth[..., None] * ray_c
        n_c = p_c - center_c
        n_c = n_c / jnp.linalg.norm(n_c, axis=-1, keepdims=True)
        img = jnp.where(closer, phong_shade(p_c, n_c), 0.0)
    return out_depth, img


@functools.partial(jax.jit, static_argnames=("w", "h"))
def raycast_plane(prev_depth, T_wc, K, n_w, w: int, h: int):
    """Analytic plane n.x = -1 (RaycastPlane, cu_raycast.cu:284-310)."""
    ray_c = K.unproject_grid(w, h)
    n_c = se3.plane_b_from_a(T_wc, jnp.asarray(n_w, jnp.float32))
    depth = -1.0 / (ray_c @ n_c)
    closer = (depth > 0) & (~(depth >= prev_depth) | ~jnp.isfinite(prev_depth))
    out_depth = jnp.where(closer, depth, prev_depth)
    p_c = depth[..., None] * ray_c
    img = jnp.where(closer, phong_shade(p_c, n_c / jnp.linalg.norm(n_c)), 0.0)
    return out_depth, img
