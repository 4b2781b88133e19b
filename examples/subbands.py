"""Subband addressing demo: transform, inspect, zero one band, invert.

Analogue of /root/reference/examples/subbands/.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import band_rect, fdwt2, idwt2
from libdwt_tpu.utils.subband import count_subbands
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()

    img = jnp.asarray(test_image(args.size, args.size))
    y = fdwt2(img, "cdf97", args.levels)

    n = count_subbands(args.size, args.size, args.levels)
    print(f"{n} nonempty subbands at J={args.levels}")
    for j in range(1, args.levels + 1):
        for band in ("HL", "LH", "HH"):
            ry, rx = band_rect(args.size, args.size, j, band)
            v = y[ry, rx]
            print(f"  {band}{j}: {v.shape[0]}x{v.shape[1]} "
                  f"energy {float((v**2).sum()):.1f}")

    # zero the finest HH and reconstruct
    ry, rx = band_rect(args.size, args.size, 1, "HH")
    y2 = y.at[ry, rx].set(0.0)
    rec = idwt2(y2, "cdf97", args.levels)
    print(f"HH1 removed: max deviation {float(jnp.abs(rec - img).max()):.3f}")


if __name__ == "__main__":
    main()
