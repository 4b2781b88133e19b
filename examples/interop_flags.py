"""Flags-style transform API over numpy / torch multi-channel images.

Analogue of the reference's OpenCV binding demos
(/root/reference/examples/opencv/main.cpp and
/root/reference/examples/opencv-subbands): pad to a power of two,
transform every channel with the dwt::transform-style flags API,
normalize for display (wtshow), pull one subband as a view, invert and
compare.
"""
import argparse

import numpy as np

from libdwt_tpu import band_view
from libdwt_tpu.interop import (
    DWT_CDF97,
    DWT_FORWARD,
    DWT_INVERSE,
    resize_pot,
    transform,
    wtshow,
)
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=200)  # deliberately non-POT
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--torch", action="store_true",
                    help="round-trip through torch tensors instead of numpy")
    args = ap.parse_args()

    base = test_image(args.size, args.size, dtype=np.float32)
    img = np.stack([base * (c + 1) / args.channels
                    for c in range(args.channels)], axis=-1)
    if args.torch:
        import torch

        img = torch.from_numpy(img)

    pot = resize_pot(img)
    print(f"input {tuple(img.shape)} -> power-of-two {tuple(pot.shape)}")

    coeffs = transform(pot, DWT_FORWARD, wavelet=DWT_CDF97,
                       level=args.levels)
    disp = wtshow(coeffs)
    disp_np = np.asarray(disp)
    print(f"wtshow display range: [{disp_np.min():.3f}, {disp_np.max():.3f}]")

    chan0 = np.asarray(coeffs)[..., 0]
    ll = band_view(chan0, args.levels, "LL")
    hh1 = band_view(chan0, 1, "HH")
    print(f"LL{args.levels} {ll.shape} energy={float((ll ** 2).sum()):.1f}  "
          f"HH1 {hh1.shape} energy={float((hh1 ** 2).sum()):.3f}")

    rec = transform(coeffs, DWT_INVERSE, wavelet=DWT_CDF97,
                    level=args.levels)
    err = float(np.abs(np.asarray(rec) - np.asarray(pot)).max())
    print(f"round trip max abs err = {err:.2e}")
    raise SystemExit(0 if err <= 1e-4 else 1)


if __name__ == "__main__":
    main()
