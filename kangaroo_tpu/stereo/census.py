"""Census transform + Hamming-cost stereo.

TPU-native equivalent of src/cu_census.cu. The reference packs census bits
into ulong / ulong2 / ulong4 (64/128/256-bit descriptors); TPUs have no native
64-bit lanes, so descriptors are (H, W, K) uint32 arrays — bit i of word k is
comparison index 32*k + i. Hamming distances are identical; only the word
split differs.

Window layouts (matching the reference's comparison sets):
  * ``census9x7``  — 9 wide x 7 tall, 63 comparisons, K=2  (cu_census.cu:18-46)
  * ``census11x11`` — 11x11, 121 comparisons, K=4          (cu_census.cu:52-110)
  * ``census16x16`` — 8 wide x 16 tall, 128 comparisons, K=4 (cu_census.cu:116-177;
    despite the name, the reference compares c in [-4,4) x r in [-8,8))

Cost volumes are (D, H, W) float32 with vol[d, y, x] = cost of matching left
pixel x against right pixel x + sd*d (sd=-1 for the left-anchored volume).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# (name, offsets, capacity_bits): capacity matches sizeof(T)*8 used by the
# reference's score normalisation (cu_census.cu:293).
_WINDOWS = {
    "9x7": ([(r, c) for r in range(-3, 4) for c in range(-4, 5)], 64),
    "11x11": ([(r, c) for r in range(-5, 6) for c in range(-5, 6)], 128),
    "16x16": ([(r, c) for r in range(-8, 8) for c in range(-4, 4)], 256),
}


def _shift_clamped(img, r: int, c: int):
    """img sampled at (y+r, x+c) with clamped boundary (GetWithClampedRange)."""
    H, W = img.shape
    pr, pc = abs(r), abs(c)
    padded = jnp.pad(img, ((pr, pr), (pc, pc)), mode="edge")
    return jax.lax.dynamic_slice(padded, (pr + r, pc + c), (H, W))


def census(img, window: str = "16x16"):
    """Census-transform a grayscale (H, W) image -> (H, W, K) uint32 words.

    Bit set when neighbour < center (cu_census.cu:33-41).
    """
    offsets, _ = _WINDOWS[window]
    n_words = -(-len(offsets) // 32)
    img = jnp.asarray(img)
    words = [jnp.zeros(img.shape, jnp.uint32) for _ in range(n_words)]
    for k, (r, c) in enumerate(offsets):
        q = _shift_clamped(img, r, c)
        bit = (q < img).astype(jnp.uint32) << jnp.uint32(k % 32)
        words[k // 32] = words[k // 32] | bit
    return jnp.stack(words, axis=-1)


def census9x7(img):
    return census(img, "9x7")


def census11x11(img):
    return census(img, "11x11")


def census16x16(img):
    return census(img, "16x16")


def hamming_distance(a, b):
    """Popcount of XOR over the word axis (hamming_distance.h:12-62)."""
    return jnp.sum(jax.lax.population_count(a ^ b), axis=-1).astype(jnp.uint32)


def norm_bits(window: str) -> int:
    """Bit capacity of the reference's descriptor type: sizeof(T)*8, the score
    normaliser in CensusStereoVolume (cu_census.cu:293). For the 16x16 window
    this is 256 even though only 128 comparisons are stored."""
    return _WINDOWS[window][1]


@functools.partial(jax.jit, static_argnames=("max_disp", "sd", "bits", "dtype"))
def census_cost_volume(left, right, max_disp: int, sd: float = -1.0,
                       bits: int | None = None, dtype=jnp.float32):
    """Census cost volume: vol[d, y, x] = Hamming(left[y,x], right[y,x+sd*d]) / bits,
    0.5 where x+sd*d is out of bounds (CensusStereoVolume, cu_census.cu:272-314).

    left/right are census images (H, W, K) uint32. ``bits`` is the score
    normaliser; defaults to the stored word capacity (pass
    ``norm_bits(window)`` for reference-exact scores with the 16x16 window).

    The per-disparity shift is a lane roll, not an indexed slice (clipped
    fancy indexing lowers to a gather on TPU; the wrapped lanes land on
    out-of-bounds positions that are masked to 0.5 either way). ``dtype``
    may be bfloat16: with a power-of-two ``bits`` every cost k/bits with
    k <= 256 is exactly representable, so the half-sized volume is
    bit-identical through downstream f32 aggregation.
    """
    H, W, K = left.shape
    inv_bits = 1.0 / (bits if bits is not None else K * 32)
    sd = int(sd)
    x = jnp.arange(W)

    def slice_d(d):
        xd = x + sd * d
        ok = (xd >= 0) & (xd < W)
        r = jnp.roll(right, -sd * d, axis=1)
        ham = hamming_distance(left, r).astype(jnp.float32) * inv_bits
        return jnp.where(ok[None, :], ham, 0.5).astype(dtype)

    return jnp.stack([slice_d(d) for d in range(max_disp)], axis=0)


@functools.partial(jax.jit, static_argnames=("max_disp",))
def census_stereo(left, right, max_disp: int):
    """WTA Hamming disparity (CensusStereo, cu_census.cu:226-266).

    Searches d in [0, min(max_disp, x)) (the reference iterates d < maxDisp
    with maxDisp = min(maxDispVal, x)); returns int32 disparity, -1 where no
    candidate exists.
    """
    H, W, K = left.shape
    x = jnp.arange(W)
    best_score = jnp.full((H, W), 0xFFFFF, jnp.uint32)
    best_disp = jnp.full((H, W), -1, jnp.int32)
    for d in range(max_disp):
        xd = x - d
        ok = (d < x) & (xd >= 0)
        # lane roll, not clipped indexing (a gather on TPU); wrapped lanes
        # are masked by ok
        r = jnp.roll(right, d, axis=1)
        score = hamming_distance(left, r)
        better = ok[None, :] & (score < best_score)
        best_score = jnp.where(better, score, best_score)
        best_disp = jnp.where(better, d, best_disp)
    return best_disp
