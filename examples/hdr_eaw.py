"""Edge-avoiding wavelet detail manipulation (HDR-style tone mapping).

Analogue of /root/reference/examples/hdr/ and /eaw/: decompose with
WCDF 9/7 (data-dependent weights), compress the approximation range and
boost details, reconstruct with the stored weights.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.eaw import eaw_wavedec2, eaw_waverec2
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--detail-boost", type=float, default=1.5)
    ap.add_argument("--base-compress", type=float, default=0.5)
    args = ap.parse_args()

    img = jnp.asarray(test_image(args.size, args.size).astype(np.float32))

    coeffs, weights = eaw_wavedec2(img, "cdf97", args.levels, alpha=args.alpha)
    tone = [coeffs[0] * args.base_compress] + [
        tuple(b * args.detail_boost for b in lvl) for lvl in coeffs[1:]
    ]
    out = eaw_waverec2(tone, weights, "cdf97")

    # sanity: identity manipulation reconstructs exactly
    ident = eaw_waverec2(coeffs, weights, "cdf97")
    err = float(jnp.abs(ident - img).max())
    print(f"identity reconstruction err: {err:.2e}")
    print(f"tone-mapped range: [{float(out.min()):.1f}, {float(out.max()):.1f}] "
          f"(input [{float(img.min()):.1f}, {float(img.max()):.1f}])")


if __name__ == "__main__":
    main()
