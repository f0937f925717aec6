"""Image sampling / interpolation primitives.

TPU-native equivalent of include/kangaroo/sampling.h and the interpolated
accessors on Image (include/kangaroo/Image.h:282-400): clamped integer access,
bilinear / bicubic / Catmull-Rom sampling, central differences, and bounds
tests. Images are (H, W) or (H, W, C) arrays; the pixel at column x, row y is
``img[y, x]`` (the reference's ``img(x, y)``).

All samplers take vectorized float/int coordinate arrays and gather with
clamped indices, so out-of-bounds coordinates return edge values; callers that
need reference-exact masking combine with :func:`in_bounds`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_f32_bits(flat, idx):
    """Bit-exact ``jnp.take(flat, idx, axis=0)`` for f32 data, 2.7x faster
    on TPU.

    XLA's per-pixel f32 gather runs at ~7 ns/elem (2.18 ms for 307k
    elements at VGA — the measured 'gather floor' of docs/PERF.md). The
    same gather expressed over the f32 words' 16-bit halves — bitcast to
    u16[N, 2], gather rows, bitcast back — runs at ~2.6 ns/elem (0.80 ms):
    the (2, 128) 16-bit tiling packs both halves of a word into one lane
    read, and the row gather moves half-width lanes. u16 (not bf16!) is
    essential: reinterpreted halves can encode signaling NaNs/denormals
    that a float gather path may canonicalize (observed: 0.8% of elements
    off by 1 ulp via bf16), while integer moves are exact.

    ``flat`` is (N,) or (N, C) float32; ``idx`` any int shape. Backward is
    the gather's usual scatter-add, so this is a drop-in for ``jnp.take``
    under ``jax.grad`` (the bitcasts themselves are not differentiable).
    """
    return _take_bits_fwd_impl(flat, idx)


def _take_bits_fwd_impl(flat, idx, fence: bool = False):
    assert flat.dtype == jnp.float32, flat.dtype
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint16)  # (N[, C], 2)
    if flat.ndim == 2:
        bits = bits.reshape(flat.shape[0], -1)
    if fence:
        # fence the u16 buffers: without barriers XLA fuses the bitcasts
        # into neighbours and layout assignment relayout-copies the u16
        # intermediates ({1,0:T(8,128)} <-> {0,1:T(4,128)} round trips).
        # In a STANDALONE program those copies pipeline with adjacent
        # dispatches and the fence only blocks useful fusion (KF frame
        # 4.08 unfenced vs 4.51 fenced) — but inside a lax.scan body they
        # SERIALIZE every iteration, and the fenced gather measured 4.14
        # vs 6.77 ms/frame on the KF sequence replay. Hence the tri-state
        # route (take_f32): unfenced standalone, fenced in scan bodies.
        bits = jax.lax.optimization_barrier(bits)
        got = jax.lax.optimization_barrier(jnp.take(bits, idx, axis=0))
    else:
        got = jnp.take(bits, idx, axis=0)
    out = jax.lax.bitcast_convert_type(
        got.reshape(*idx.shape, flat.shape[1], 2) if flat.ndim == 2 else got,
        jnp.float32)
    return out


def _take_bits_fwd(flat, idx):
    return _take_bits_fwd_impl(flat, idx), (idx, flat.shape)


def _take_bits_bwd(res, ct):
    idx, shape = res
    flat_ct = jnp.zeros(shape, ct.dtype).at[idx.reshape(-1)].add(
        ct.reshape(-1, *shape[1:]))
    return flat_ct, None


take_f32_bits.defvjp(_take_bits_fwd, _take_bits_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_f32_bits_fenced(flat, idx):
    """:func:`take_f32_bits` with the u16 buffers optimization_barrier-
    fenced — the scan-body variant (see _take_bits_fwd_impl). Bit-exact
    and same VJP."""
    return _take_bits_fwd_impl(flat, idx, fence=True)


def _take_bits_fenced_fwd(flat, idx):
    return _take_bits_fwd_impl(flat, idx, fence=True), (idx, flat.shape)


take_f32_bits_fenced.defvjp(_take_bits_fenced_fwd, _take_bits_bwd)


def take_f32(flat, idx, bits=True):
    """``jnp.take(flat, idx, axis=0)`` with an explicit tri-state route.

    - ``bits=True`` (default): the 16-bit-halves gather — 1.6 ms faster
      than the plain take on the standalone one-jit KinectFusion frame.
    - ``bits="fence"``: the same gather with its u16 buffers
      optimization_barrier-fenced — the route for ``lax.scan`` bodies,
      where the un-fenced form's u16 relayout copies serialize every
      iteration (replay 6.77 ms/frame un-fenced bits, 6.06 plain, 4.14
      fenced) while the fence costs ~0.4 ms in standalone programs whose
      copies would have pipelined (KF frame 4.08 -> 4.51).
    - ``bits=False``: plain f32 take.
    All three routes are bit-exact.

    The choice is an explicit STATIC argument (threaded from the app
    layer, e.g. make_frame_step's ``gather_bits``) rather than ambient
    state: jit's tracing cache is keyed on avals only, so a context-
    manager flag silently reuses whichever trace happened first.
    """
    if not bits:
        return jnp.take(flat, idx, axis=0)
    if bits == "fence":
        return take_f32_bits_fenced(flat, idx)
    return take_f32_bits(flat, idx)


def _clip_xy(img, x, y):
    return jnp.clip(x, 0, img.shape[1] - 1), jnp.clip(y, 0, img.shape[0] - 1)


def get_clamped(img, x, y):
    """Clamped integer access (Image.h GetWithClampedRange:298)."""
    xi, yi = _clip_xy(img, jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32))
    return img[yi, xi]


def in_bounds(img, x, y, border=0):
    """Image.h InBounds(float, float, border):288."""
    return (
        (x >= border)
        & (x < img.shape[1] - border)
        & (y >= border)
        & (y < img.shape[0] - border)
    )


def bilinear(img, x, y):
    """Bilinear sample at float coords (Image.h GetBilinear:319-335).

    Indices are clamped so the sample is defined everywhere; inside the image
    it matches the reference exactly.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1, iy1 = ix0 + 1, iy0 + 1
    ix0, iy0 = _clip_xy(img, ix0, iy0)
    ix1, iy1 = _clip_xy(img, ix1, iy1)
    f = img.astype(jnp.float32)
    tl = f[iy0, ix0]
    tr = f[iy0, ix1]
    bl = f[iy1, ix0]
    br = f[iy1, ix1]
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    return top + (bot - top) * fy


def nearest(img, x, y):
    """Nearest-neighbour sample (Image.h GetNearestNeighbour:337).

    f32 images route through :func:`take_f32_bits` (bit-exact, 2.7x the
    plain gather on TPU); other dtypes use clamped fancy indexing."""
    xi = jnp.floor(jnp.asarray(x) + 0.5).astype(jnp.int32)
    yi = jnp.floor(jnp.asarray(y) + 0.5).astype(jnp.int32)
    if img.dtype == jnp.float32 and img.ndim in (2, 3) and xi.ndim >= 1:
        H, W = img.shape[:2]
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        flat = img.reshape(H * W, -1) if img.ndim == 3 else img.reshape(-1)
        return take_f32_bits(flat, yi * W + xi)
    return get_clamped(img, xi, yi)


def central_diff(img, x, y):
    """Central difference (dI/dx, dI/dy) at integer coords (Image.h:367-389)."""
    xi = jnp.asarray(x, jnp.int32)
    yi = jnp.asarray(y, jnp.int32)
    dx = (get_clamped(img, xi + 1, yi).astype(jnp.float32) - get_clamped(img, xi - 1, yi)) / 2.0
    dy = (get_clamped(img, xi, yi + 1).astype(jnp.float32) - get_clamped(img, xi, yi - 1)) / 2.0
    return dx, dy


def central_diff_bilinear(img, x, y):
    """Central difference at float coords: bilinear blend of the four integer
    central diffs (Image.h GetCentralDiff(float,float):391-414)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    bldx, bldy = central_diff(img, ix, iy)
    brdx, brdy = central_diff(img, ix + 1, iy)
    tldx, tldy = central_diff(img, ix, iy + 1)
    trdx, trdy = central_diff(img, ix + 1, iy + 1)
    dx = (bldx + (brdx - bldx) * fx) * (1 - fy) + (tldx + (trdx - tldx) * fx) * fy
    dy = (bldy + (brdy - bldy) * fx) * (1 - fy) + (tldy + (trdy - tldy) * fx) * fy
    return dx, dy


# --- cubic kernels (sampling.h:49-103) -------------------------------------


def _cubic_bspline_weights(f):
    f2 = f * f
    f3 = f2 * f
    w0 = (1.0 - 3.0 * f + 3.0 * f2 - f3) / 6.0
    w1 = (4.0 - 6.0 * f2 + 3.0 * f3) / 6.0
    w2 = (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) / 6.0
    w3 = f3 / 6.0
    return w0, w1, w2, w3


def _catmull_rom_weights(f):
    f2 = f * f
    f3 = f2 * f
    w0 = 0.5 * (-f + 2.0 * f2 - f3)
    w1 = 0.5 * (2.0 - 5.0 * f2 + 3.0 * f3)
    w2 = 0.5 * (f + 4.0 * f2 - 3.0 * f3)
    w3 = 0.5 * (-f2 + f3)
    return w0, w1, w2, w3


def _cubic_sample(img, x, y, weight_fn):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    wx = weight_fn(fx)
    wy = weight_fn(fy)
    if img.ndim == 3:
        wx = tuple(w[..., None] for w in wx)
        wy = tuple(w[..., None] for w in wy)
    acc = 0.0
    for j, wyj in enumerate(wy):
        row = 0.0
        for i, wxi in enumerate(wx):
            row = row + wxi * get_clamped(img, ix + i - 1, iy + j - 1).astype(jnp.float32)
        acc = acc + wyj * row
    return acc


def bicubic(img, x, y):
    """Cubic B-spline sample (sampling.h:104-170)."""
    return _cubic_sample(img, x, y, _cubic_bspline_weights)


def catmull_rom(img, x, y):
    """Catmull-Rom sample (sampling.h:171-278)."""
    return _cubic_sample(img, x, y, _catmull_rom_weights)
