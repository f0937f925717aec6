"""Depth-map utilities.

TPU-native equivalent of src/cu_depth_tools.cu and include/kangaroo/disparity.h:
disparity->depth, Kinect data filtering, unprojection to point images ("vbo"),
point colouring, and keyframe texturing.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import sampling, se3


def disp_to_depth(disp, fu, baseline, min_disp=0.0):
    """depth = fu*baseline/disp, NaN below min_disp (Disp2Depth,
    cu_depth_tools.cu:16-30)."""
    return jnp.where(disp >= min_disp, fu * baseline / disp, jnp.nan)


def depth_from_disparity_vbo(disp, K, baseline, min_disp=16.0):
    """Disparity image -> (H, W, 4) homogeneous points (DisparityImageToVbo,
    cu_dense_stereo.cu:633-646; DepthFromDisparity, disparity.h:10-20)."""
    H, W = disp.shape
    z = K.fu * baseline / disp
    v, u = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    x = z * (u - K.u0) / K.fu
    y = z * (v - K.v0) / K.fv
    w = jnp.where(disp >= min_disp, 1.0, 0.0)
    z = jnp.where(disp >= min_disp, z, jnp.nan)
    return jnp.stack([x, y, z, w], axis=-1)


def filter_bad_kinect_data(depth_mm):
    """NaN-out Kinect returns closer than 200mm (cu_depth_tools.cu:33-53)."""
    return jnp.where(depth_mm >= 200.0, depth_mm.astype(jnp.float32), jnp.nan)


def depth_to_vbo(depth, K, depth_scale=1.0):
    """Unproject a depth image to a (H, W, 4) point image with w=1
    (DepthToVbo, cu_depth_tools.cu:61-78)."""
    H, W = depth.shape
    P = K.unproject_grid(W, H, depth_scale * depth)
    return jnp.concatenate([P, jnp.ones((H, W, 1), jnp.float32)], axis=-1)


def colour_vbo(points, img_c, KT_cd):
    """Project a point image into a colour camera and sample rgb
    (ColourVbo, cu_depth_tools.cu:86-116). Returns (H, W, 4) uint8."""
    P = points[..., :3]
    KP = P @ KT_cd[:, :3].T + KT_cd[:, 3]
    u = KP[..., 0] / KP[..., 2]
    v = KP[..., 1] / KP[..., 2]
    ok = sampling.in_bounds(img_c, u, v, 1)
    rgb = sampling.bilinear(img_c, u, v)
    rgba = jnp.concatenate([rgb, jnp.full(rgb.shape[:-1] + (1,), 255.0)], axis=-1)
    return jnp.where(ok[..., None], rgba, 0.0).astype(jnp.uint8)


def normals_from_vbo(points):
    """Normals from forward differences of a point image
    (NormalsFromVbo, src/cu_normals.cu:12-45). Returns (H, W, 4); w=1 marks
    valid, last row/column get w=0."""
    H, W = points.shape[:2]
    Vc = points[..., :3]
    Vr = jnp.roll(Vc, -1, axis=1)
    Vu = jnp.roll(Vc, -1, axis=0)
    a = Vr - Vc
    b = Vu - Vc
    axb = jnp.cross(a, b)
    mag = jnp.linalg.norm(axb, axis=-1, keepdims=True)
    n = -axb / mag
    valid = jnp.ones((H, W), jnp.float32)
    valid = valid.at[:, -1].set(0.0).at[-1, :].set(0.0)
    n = jnp.where(valid[..., None] > 0, n, 0.0)
    return jnp.concatenate([n, valid[..., None]], axis=-1)


def texture_depth(depth, normals, keyframe_img, K_kf, T_iw, T_wd, K_depth):
    """Texture a depth map from one keyframe (TextureDepth,
    cu_depth_tools.cu:123-159).

    keyframe_img: (Hk, Wk[, 3]); T_iw: keyframe world->image-camera (3, 4);
    T_wd: depth-camera -> world. Returns (H, W, 4) float colour in [0, 1]
    (alpha 1), black where unprojectable or facing away (N.z >= -0.2).
    """
    import jax.numpy as jnp

    H, W = depth.shape
    P_d = K_depth.unproject_grid(W, H, depth)
    P_w = se3.transform(T_wd, P_d)
    N_w = se3.rotate(T_wd, normals[..., :3])
    P_kf = se3.transform(T_iw, P_w)
    p = K_kf.project(P_kf)
    N_c = se3.rotate(T_iw, N_w)
    ok = sampling.in_bounds(keyframe_img, p[..., 0], p[..., 1], 2) & (
        N_c[..., 2] < -0.2
    )
    rgb = sampling.bilinear(keyframe_img, p[..., 0], p[..., 1])
    if rgb.ndim == 2:
        rgb = rgb[..., None].repeat(3, axis=-1)
    rgb = rgb / 255.0
    out = jnp.where(ok[..., None], rgb, 0.0)
    return jnp.concatenate([out, jnp.ones((H, W, 1), jnp.float32)], axis=-1)


def texture_depth_keyframes(depth, normals, phong, keyframes, T_wd, K_depth,
                            min_ndot=0.1):
    """Weighted multi-keyframe texturing (TextureDepth over Mat<Keyframe,10>,
    cu_depth_tools.cu:165-214). ``keyframes`` is a list of (img, K, T_iw);
    weights are the view-alignment ndot = N.P/|P|; falls back to the phong
    shading where no keyframe sees the point.
    """
    import jax.numpy as jnp

    H, W = depth.shape
    P_d = K_depth.unproject_grid(W, H, depth)
    P_w = se3.transform(T_wd, P_d)
    N_w = se3.rotate(T_wd, normals[..., :3])
    colour = jnp.zeros((H, W, 3), jnp.float32)
    wsum = jnp.zeros((H, W), jnp.float32)
    for img, K_kf, T_iw in keyframes:
        P_kf = se3.transform(T_iw, P_w)
        p = K_kf.project(P_kf)
        N_c = se3.rotate(T_iw, N_w)
        ndot = jnp.sum(N_c * P_kf, axis=-1) / -jnp.linalg.norm(P_kf, axis=-1)
        ok = (
            sampling.in_bounds(img, p[..., 0], p[..., 1], 2)
            & (ndot > min_ndot)
            & (P_kf[..., 2] > 0)
        )
        rgb = sampling.bilinear(img, p[..., 0], p[..., 1])
        if rgb.ndim == 2:
            rgb = rgb[..., None].repeat(3, axis=-1)
        w = jnp.where(ok, ndot, 0.0)
        colour = colour + w[..., None] * rgb / 255.0
        wsum = wsum + w
    fallback = jnp.repeat(phong[..., None], 3, axis=-1)
    out = jnp.where(wsum[..., None] > 0, colour / jnp.maximum(wsum, 1e-9)[..., None], fallback)
    return jnp.concatenate([out, jnp.ones((H, W, 1), jnp.float32)], axis=-1)
