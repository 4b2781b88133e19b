"""1-D multiresolution analysis, dumped as gnuplot-ready TSV.

Analogue of /root/reference/examples/mra/mra.c: decompose a signal,
write each level's approximation/detail to data files.
"""
import argparse
import os

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import wavedec1
from libdwt_tpu.utils.perf import save_tsv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--out", default="/tmp/mra")
    args = ap.parse_args()

    t = np.linspace(0, 1, args.n)
    sig = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 40 * t)
    sig[args.n // 2 :] += 0.3

    coeffs = wavedec1(jnp.asarray(sig.astype(np.float32)), args.wavelet, args.levels)
    os.makedirs(args.out, exist_ok=True)
    save_tsv(os.path.join(args.out, "approx.tsv"),
             list(enumerate(np.asarray(coeffs[0]))))
    for j, det in enumerate(coeffs[1:]):
        lvl = args.levels - j
        save_tsv(os.path.join(args.out, f"detail{lvl}.tsv"),
                 list(enumerate(np.asarray(det))))
    print(f"wrote approximation + {args.levels} detail bands to {args.out}/")


if __name__ == "__main__":
    main()
