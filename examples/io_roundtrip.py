"""Image file I/O round trip: PGM and ASCII MAT.

Analogue of /root/reference/examples/load (PGM load/save round trip)
and /cdf97-test (MAT dumps of transform outputs for external
inspection).
"""
import argparse
import os

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import fdwt2
from libdwt_tpu.utils import io as dio
from libdwt_tpu.utils.nativelib import available
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", default="/tmp/dwtio")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    img = test_image(args.size, args.size).astype(np.float32)
    img = img / img.max()

    pgm = os.path.join(args.out, "image.pgm")
    dio.save_pgm(pgm, img)
    back = dio.load_pgm(pgm)
    err = np.abs(back - img).max()
    print(f"PGM round trip (native={available()}): max err {err:.5f} "
          f"(quantization bound {0.5/255:.5f})")

    y = np.asarray(fdwt2(jnp.asarray(img), "cdf97", 3))
    mat = os.path.join(args.out, "transform.mat")
    dio.save_mat(mat, y)
    back = dio.load_mat(mat)
    print(f"MAT round trip: shape {back.shape}, max err "
          f"{np.abs(back - y).max():.2e} (%f format)")


if __name__ == "__main__":
    main()
