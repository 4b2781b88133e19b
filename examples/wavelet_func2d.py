"""Plot 2-D wavelet / scaling functions.

Analogue of /root/reference/examples/func2/func2.c: zero a packed
transform, set a single unit coefficient inside a chosen subband at a
chosen level, inverse-transform, and save the resulting 2-D wavelet
(or, for LL, scaling) function as a normalized PGM image.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import band_rect, idwt2
from libdwt_tpu.utils.io import save_pgm
from libdwt_tpu.utils.subband import j_limit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--wavelet", default="cdf53",
                    choices=["cdf53", "cdf97", "interp53"])
    ap.add_argument("--band", default="HL", choices=["LL", "HL", "LH", "HH"])
    ap.add_argument("--level", type=int, default=0,
                    help="0 = max_j - 3 (the reference's choice)")
    ap.add_argument("--out", default="/tmp/wavelet_func2d.pgm")
    args = ap.parse_args()

    n = args.size
    max_j = j_limit(n, n)
    j = args.level or max(1, max_j - 3)
    print(f"size=({n},{n}) max_j={max_j} j={j} band={args.band}")

    y = jnp.zeros((n, n), jnp.float32)
    ry, rx = band_rect(n, n, j, args.band)
    cy = (ry.start + ry.stop) // 2
    cx = (rx.start + rx.stop) // 2
    y = y.at[cy, cx].set(1.0)

    f = np.asarray(idwt2(y, args.wavelet, None))
    lo, hi = float(f.min()), float(f.max())
    print(f"function range [{lo:.4f}, {hi:.4f}]")

    # normalize to [0, 1] around zero for display
    scale = max(abs(lo), abs(hi)) or 1.0
    img = 0.5 + 0.5 * f / scale
    save_pgm(args.out, img.astype(np.float32))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
