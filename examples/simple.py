"""Minimal forward + inverse transform round trip.

Analogue of /root/reference/examples/simple/simple.c (and
simple-double/simple-int via --dtype): fill a test image, forward
multi-level CDF 9/7, inverse, compare.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import fdwt2, idwt2
from libdwt_tpu.utils.testimg import EPS, test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64", "i32"])
    args = ap.parse_args()

    dtype = {"f32": np.float32, "f64": np.float64, "i32": np.int32}[args.dtype]
    img = jnp.asarray(test_image(args.size, args.size, dtype=dtype))

    coeffs = fdwt2(img, args.wavelet, args.levels)
    rec = idwt2(coeffs, args.wavelet, args.levels)

    err = float(np.abs(np.asarray(rec).astype(np.float64) - np.asarray(img)).max())
    if np.issubdtype(dtype, np.integer):
        ok = err == 0
        print(f"int round trip: max abs err = {err:.0f} -> {'EXACT' if ok else 'FAIL'}")
    else:
        ok = err <= EPS
        print(f"float round trip: max abs err = {err:.2e} (eps {EPS}) -> "
              f"{'OK' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
