"""Synthesize scaling/wavelet functions by inverting a delta.

Analogue of /root/reference/examples/wavelet-func and /filter-coeffs:
put a single 1 in one coefficient position, run the inverse transform,
and the impulse response traces the scaling (L) or wavelet (H) function.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import idwt1_packed
from libdwt_tpu.utils.perf import save_tsv
from libdwt_tpu.utils.subband import ceil_div_pow2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--kind", default="scaling", choices=["scaling", "wavelet"])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    y = np.zeros(args.n, np.float32)
    n_low = ceil_div_pow2(args.n, args.levels)
    pos = n_low // 2 if args.kind == "scaling" else n_low + n_low // 2
    y[pos] = 1.0

    func = np.asarray(idwt1_packed(jnp.asarray(y), args.wavelet, args.levels))
    support = np.where(np.abs(func) > 1e-6)[0]
    print(f"{args.wavelet} {args.kind} function: support "
          f"[{support[0]}, {support[-1]}], peak {func.max():.4f}")
    if args.out:
        save_tsv(args.out, list(enumerate(func)))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
