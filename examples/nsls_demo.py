"""Non-separable lifting (NSLS) vs separable transform comparison.

Analogue of /root/reference/examples/nsls/: run the non-separable 2-D
lifting scheme (merged x+y stages with squared coefficients,
cores-nsls.c) next to the classic separable transform, confirm they
agree to float rounding, and round-trip through the NSLS inverse.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.nsls import nsls_dwt2_level, nsls_idwt2_level
from libdwt_tpu.ops.separable import dwt2_level
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--wavelet", default="cdf97", choices=["cdf97", "cdf53"])
    args = ap.parse_args()

    img = jnp.asarray(test_image(args.size, args.size))

    nsls = nsls_dwt2_level(img, args.wavelet)
    sep = dwt2_level(img, args.wavelet)
    for name, a, b in zip(("LL", "HL", "LH", "HH"), nsls, sep):
        d = float(jnp.abs(a - b).max())
        print(f"{name}: nsls vs separable max|diff| = {d:.2e}")

    rec = nsls_idwt2_level(*nsls, wavelet=args.wavelet)
    err = float(jnp.abs(rec - img).max())
    print(f"NSLS round trip max|err| = {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
