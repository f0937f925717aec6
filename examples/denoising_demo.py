"""Variational examples: ROF/TGV denoising, deconvolution, inpainting.

Offline equivalents of applications/examples/{Denoising,Deconvolution,
InpaintingUsingDenoising}.cpp.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import _common

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--lam", type=float, default=8.0)
    ap.add_argument("--iterations", type=int, default=200)
    args = ap.parse_args()

    from kangaroo_tpu.ops.convolution import convolve
    from kangaroo_tpu.variational import deconvolution, rof, tgv

    out = _common.out_dir()
    rng = np.random.default_rng(0)
    clean = jnp.asarray(_common.test_image(320, 240)) / 255.0
    noisy = clean + jnp.asarray(rng.normal(0, args.noise, clean.shape).astype(np.float32))
    _common.save_png(f"{out}/noisy.png", noisy)

    u_rof = rof.denoise(noisy, lam=args.lam, iterations=args.iterations)
    _common.save_png(f"{out}/denoised_rof.png", u_rof)

    u_tgv = tgv.denoise(noisy, sigma=0.29, tau=0.29, delta=0.05,
                        iterations=args.iterations)
    _common.save_png(f"{out}/denoised_tgv.png", u_tgv)

    k = jnp.ones((7, 7), jnp.float32)
    blurry = convolve(clean, k)
    u_dec = deconvolution.deconvolve(blurry, k, iterations=args.iterations)
    _common.save_png(f"{out}/blurry.png", blurry)
    _common.save_png(f"{out}/deconvolved.png", u_dec)

    mask = jnp.asarray((rng.random(clean.shape) > 0.5).astype(np.float32))
    corrupted = clean * mask
    u_inp = deconvolution.inpaint(corrupted, mask, iterations=args.iterations)
    _common.save_png(f"{out}/corrupted.png", corrupted)
    _common.save_png(f"{out}/inpainted.png", u_inp)
    print(f"wrote denoising/deconvolution/inpainting results to {out}/")


if __name__ == "__main__":
    main()
