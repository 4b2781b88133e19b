"""Find the strongest blobs/ridges of an S-transform plane.

Analogue of /root/reference/examples/spectra-blobs/blobs.c: build a
TF plane (there: loaded from a MAT file of summed stellar spectra;
here: the S-transform of a synthetic multi-component signal, or a MAT
file if one is given), save it as PGM, extract the N strongest ridge
points with matched Gaussian suppression
(spectra_st_get_strongest_ridges), save them as MAT, and score the
recovered positions against the known injected components
(spectra_diff_points).
"""
import argparse
import math
import os

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.image import conv_show
from libdwt_tpu.ops.gabor import diff_points, gabor_function, gabor_st, strongest_ridges
from libdwt_tpu.utils.io import load_mat, save_mat, save_pgm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", default=None,
                    help="optional MAT file holding a ready TF plane")
    ap.add_argument("--n", type=int, default=512, help="signal length")
    ap.add_argument("--bins", type=int, default=64)
    ap.add_argument("--ridges", type=int, default=8)
    ap.add_argument("--components", type=int, default=4)
    ap.add_argument("--out", default=".", help="output directory")
    args = ap.parse_args()

    truth = None
    if args.mat:
        plane = jnp.asarray(load_mat(args.mat))
        print(f"loaded plane {plane.shape} from {args.mat}")
    else:
        # synthetic blobs: isolated Gabor components at known (t, f)
        rng = np.random.RandomState(7)
        n, bins = args.n, args.bins
        sig = np.zeros(n, np.float64)
        truth = []
        for k in range(args.components):
            t0 = int((k + 0.5) / args.components * n)
            f = rng.uniform(0.1, 0.4)  # cycles/sample
            sig += np.real(gabor_function(np.arange(n) - t0, n / 32.0, 2 * math.pi * f))
            # plane row for frequency f: gabor_st bin y analyses
            # (y+1)/bins*0.5, stored at row bins-1-y
            truth.append((t0, bins - round(f / 0.5 * bins)))
        plane = gabor_st(jnp.asarray(sig, jnp.float32), bins)

    points = np.asarray(strongest_ridges(plane, args.ridges))

    os.makedirs(args.out, exist_ok=True)
    save_pgm(os.path.join(args.out, "plane.pgm"), conv_show(plane))
    save_mat(os.path.join(args.out, "points.mat"), points.astype(np.float32))

    print(f"plane {plane.shape}; {args.ridges} strongest points (x, y):")
    for px, py in points:
        print(f"  ({int(px):4d}, {int(py):3d})")

    if truth is not None:
        d = np.asarray(diff_points(np.asarray(truth, np.float32), points))
        print("distance from each injected component to nearest found point:")
        print("  " + "  ".join(f"{v:.1f}" for v in d))
        # every injected blob must be found within a coarse TF cell
        ok = bool((d <= max(args.n / args.components / 4, 8)).all())
        raise SystemExit(0 if ok else 1)
    raise SystemExit(0)


if __name__ == "__main__":
    main()
