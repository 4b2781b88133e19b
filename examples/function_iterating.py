"""Synthesize scaling/wavelet functions by iterating the filter bank.

Analogue of /root/reference/examples/function-iterating/wavelet.c: put
a single nonzero coefficient at a deep scale of an otherwise-zero
decomposition and inverse-transform; the reconstruction approximates
the continuous scaling function (coefficient in L) or mother wavelet
(coefficient in H) at that scale.  Writes TSV suitable for gnuplot
(the reference's output convention).
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import wavedec1, waverec1


def synthesize(wavelet: str, size: int, depth_from_max: int, band: str,
               energy: float = 100.0):
    x = jnp.zeros(size, jnp.float32)
    coeffs = wavedec1(x, wavelet)  # full-depth all-zero pyramid
    jj = len(coeffs) - 1 - depth_from_max  # index into [L_J, H_J, .., H_1]
    if band == "L":
        target = 0
    else:
        target = max(1, jj)
    c = list(coeffs)
    arr = np.zeros(c[target].shape, np.float32)
    arr[arr.shape[0] // 2] = energy
    c[target] = jnp.asarray(arr)
    return np.asarray(waverec1(c, wavelet))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--depth-from-max", type=int, default=3)
    ap.add_argument("--band", default="both", choices=["L", "H", "both"])
    ap.add_argument("--out", default=None, help="TSV path (default stdout)")
    args = ap.parse_args()

    cols = []
    names = []
    for band in ("L", "H") if args.band == "both" else (args.band,):
        cols.append(synthesize(args.wavelet, args.size, args.depth_from_max, band))
        names.append("scaling" if band == "L" else "wavelet")

    lines = ["# x\t" + "\t".join(names)]
    for i in range(args.size):
        lines.append("\t".join([str(i)] + [f"{c[i]:.6f}" for c in cols]))
    text = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out} ({args.size} samples x {len(cols)} functions)")
    else:
        step = max(1, args.size // 32)
        print("\n".join(lines[::step]))
    for name, c in zip(names, cols):
        support = np.flatnonzero(np.abs(c) > 1e-4)
        print(f"# {name}: support ~[{support.min()}, {support.max()}], "
              f"L2={np.sqrt((c**2).sum()):.3f}")


if __name__ == "__main__":
    main()
