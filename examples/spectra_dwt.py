"""Wavelet power spectrum of stellar spectra: load -> median base-line
shift -> rows-only DWT -> export (SVM/MAT/PGM).

Analogue of /root/reference/examples/spectra-dwt/main.c: loads a
spectra matrix (one spectrum per row) from an ASCII MAT file (or
synthesizes one), shifts each base-line by its median
(dwt_util_shift21_med_s), runs the rows-only multi-level CDF 9/7
transform, and exports the transformed matrix in the same trio of
formats the reference writes (LIBSVM / MAT / PGM).

    python examples/spectra_dwt.py [--input spectra.mat] --levels 4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="ASCII MAT file, one spectrum per row "
                         "(synthesized when omitted)")
    ap.add_argument("--n-signals", type=int, default=32)
    ap.add_argument("--length", type=int, default=256)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--out-dir", default="/tmp/spectra-dwt")
    args = ap.parse_args()

    import numpy as np

    import jax.numpy as jnp
    from libdwt_tpu import fdwt1
    from libdwt_tpu.utils.io import load_mat, save_mat, save_pgm, save_svm
    from libdwt_tpu.utils.vecops import shift21_med

    if args.input:
        spectra = load_mat(args.input).astype(np.float32)
    else:
        rng = np.random.RandomState(0)
        t = np.linspace(0, 1, args.length)
        spectra = np.stack([
            1.0 + 0.5 * np.exp(-((t - rng.rand()) ** 2) * 40)
            + 0.05 * rng.randn(args.length)
            for _ in range(args.n_signals)
        ]).astype(np.float32)
    print(f"loaded {spectra.shape[0]} spectra of length "
          f"{spectra.shape[1]}")

    os.makedirs(args.out_dir, exist_ok=True)
    x = jnp.asarray(spectra)
    x = shift21_med(x)  # base-line to zero by per-row median
    save_pgm(os.path.join(args.out_dir, "spectra.pgm"), np.asarray(x))

    # rows-only multi-level forward (dwt_cdf97_2f1_s semantics)
    y = fdwt1(x, "cdf97", args.levels)
    arr = np.asarray(y)
    print(f"transformed: {arr.shape}, energy "
          f"{float((arr ** 2).sum()):.4g}")

    labels = np.arange(arr.shape[0], dtype=np.float32) % 2 + 1
    save_svm(os.path.join(args.out_dir, "dwt.svm"), labels, arr)
    save_mat(os.path.join(args.out_dir, "dwt.mat"), arr)
    save_pgm(os.path.join(args.out_dir, "dwt.pgm"), arr)
    print(f"wrote dwt.svm / dwt.mat / dwt.pgm under {args.out_dir}")


if __name__ == "__main__":
    main()
