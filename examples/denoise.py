"""Wavelet denoising with the universal threshold.

Analogue of the reference's denoise path (src/denoise.c used by the
spectra-blobs example): add noise, threshold detail bands, reconstruct.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.features import denoise2
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=8.0)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--mode", default="soft", choices=["soft", "hard"])
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    clean = test_image(args.size, args.size).astype(np.float32)
    noisy = clean + args.sigma * rng.randn(*clean.shape).astype(np.float32)

    den = np.asarray(denoise2(jnp.asarray(noisy), "cdf97", args.levels,
                              mode=args.mode))
    mse_in = float(((noisy - clean) ** 2).mean())
    mse_out = float(((den - clean) ** 2).mean())
    print(f"noisy MSE {mse_in:.2f} -> denoised MSE {mse_out:.2f} "
          f"({10*np.log10(mse_in/mse_out):.1f} dB gain)")
    # the pipeline's value contract: thresholding must IMPROVE the MSE
    assert mse_out < mse_in, "denoise did not reduce MSE"


if __name__ == "__main__":
    main()
