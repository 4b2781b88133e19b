"""Time-frequency analysis: STFT / CWT / S-transform planes + ridges.

Analogue of /root/reference/examples/time-freq/: analyse a chirp test
signal with the three transforms and detect ridges; dump planes as PGM.
"""
import argparse
import math

import numpy as np

from libdwt_tpu.ops import gabor as G
from libdwt_tpu.utils.io import save_pgm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--signal", type=int, default=2, help="test signal type")
    ap.add_argument("--bins", type=int, default=128)
    ap.add_argument("--sigma", type=float, default=8.0)
    ap.add_argument("--out", default="/tmp/tf")
    args = ap.parse_args()

    sig = G.test_signal(args.size, args.signal)

    ft = np.asarray(G.gabor_ft(sig, args.bins, args.sigma))
    wt = np.asarray(G.gabor_wt(sig, args.bins, args.sigma / 4, math.pi / 2))
    st = np.asarray(G.gabor_st(sig, args.bins))

    arg_plane = np.asarray(G.gabor_ft(sig, args.bins, args.sigma, out="arg"))
    inst = np.asarray(G.phase_derivative(arg_plane))
    ridges = np.asarray(G.detect_ridges1(ft, threshold=float(ft.max()) * 0.3))

    import os

    os.makedirs(args.out, exist_ok=True)
    for name, plane in [("ft", ft), ("wt", wt), ("st", st), ("ridges", ridges)]:
        mx = plane.max() or 1.0
        save_pgm(os.path.join(args.out, f"{name}.pgm"), plane / mx, binary=True)
        print(f"{name}: plane {plane.shape}, peak {mx:.3f} -> {args.out}/{name}.pgm")


if __name__ == "__main__":
    main()
