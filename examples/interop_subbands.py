"""Multi-channel subband viewer: transform, inspect, erase, invert.

Analogue of /root/reference/examples/opencv-subbands/showdwt.cpp: a
color image is padded to powers of two (resizePOT), forward-transformed
per channel through the flags API (dwt::transform), rendered viewably
(wtshow), its per-level subbands are inspected, the HL subband is
erased at EVERY level (showdwt.cpp's erase loop), and the inverse shows
the vertical-detail loss.  Instead of GUI windows the renderings are
saved as PGM files.
"""
import argparse
import os

import numpy as np

from libdwt_tpu import band_rect
from libdwt_tpu.interop import (
    DWT_CDF97,
    DWT_FORWARD,
    DWT_INVERSE,
    resize_pot,
    transform,
    wtshow,
)
from libdwt_tpu.utils.io import save_pgm
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=200,
                    help="pre-POT size (resize_pot pads to 256)")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--out", default="/tmp")
    args = ap.parse_args()

    # color test image, channels-last like cv::Mat: three phase-shifted
    # copies of the synthetic test pattern
    base = test_image(args.size, args.size, dtype=np.float32)
    src = np.stack(
        [base, np.roll(base, 7, axis=0), np.roll(base, 13, axis=1)],
        axis=-1,
    )

    big = np.asarray(resize_pot(src))
    h, w = big.shape[:2]
    print(f"source {src.shape} -> POT {big.shape}")

    coeffs = np.asarray(
        transform(big, DWT_FORWARD, DWT_CDF97, args.levels))
    view = np.asarray(wtshow(coeffs))
    save_pgm(os.path.join(args.out, "transform.pgm"), view.mean(-1))

    # subband access at every level (subband(big, ..., DWT_xx))
    for j in range(1, args.levels + 1):
        for band in ("LL", "HL", "LH", "HH"):
            if band == "LL" and j != args.levels:
                continue
            ry, rx = band_rect(h, w, j, band)
            v = coeffs[ry, rx, :]
            print(f"  {band}{j}: {v.shape[0]}x{v.shape[1]}x{v.shape[2]} "
                  f"energy={float((v ** 2).sum()):.3f}")

    # erase the HL subband at all levels (showdwt.cpp's erase loop)
    erased = coeffs.copy()
    for j in range(1, args.levels + 1):
        ry, rx = band_rect(h, w, j, "HL")
        erased[ry, rx, :] = 0.0

    rec = np.asarray(
        transform(erased, DWT_INVERSE, DWT_CDF97, args.levels))
    save_pgm(os.path.join(args.out, "erased.pgm"),
             np.clip(rec.mean(-1), 0.0, 1.0))

    full = np.asarray(
        transform(coeffs, DWT_INVERSE, DWT_CDF97, args.levels))
    err_full = np.abs(full - big).max()
    err_erased = float(np.sqrt(((rec - big) ** 2).mean()))
    print(f"round trip max|err|={err_full:.2e}; "
          f"HL-erased RMSE={err_erased:.4f}")
    # value contract: the untouched pyramid round-trips; erasing the
    # vertical-detail bands must actually lose signal
    assert err_full <= 1e-3
    assert err_erased > 1e-3


if __name__ == "__main__":
    main()
