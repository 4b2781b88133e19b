"""Dump full / horizontal-only / vertical-only CDF 9/7 transforms to
ASCII MAT files for external inspection.

Analogue of /root/reference/examples/cdf97-test/cdf97.c:26-80, which
writes the fully 2-D, rows-only and columns-only transforms of a test
image as MAT files so other tools (octave, the reference itself) can
cross-check the coefficients.
"""
import argparse
import os

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import fdwt1, fdwt2
from libdwt_tpu.utils.io import save_mat
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()

    img = jnp.asarray(test_image(args.size, args.size, dtype=np.float32))

    full = fdwt2(img, args.wavelet, args.levels)
    horiz = fdwt1(img, args.wavelet, args.levels, axis=-1)  # rows only
    vert = fdwt1(img, args.wavelet, args.levels, axis=-2)   # columns only

    os.makedirs(args.outdir, exist_ok=True)
    for name, arr in (("full", full), ("horizontal", horiz),
                      ("vertical", vert), ("input", img)):
        path = os.path.join(args.outdir, f"cdf97_{name}.mat")
        save_mat(path, np.asarray(arr))
        print(f"wrote {path} shape={arr.shape}")


if __name__ == "__main__":
    main()
