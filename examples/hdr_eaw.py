"""Edge-avoiding wavelet detail manipulation (HDR-style tone mapping).

Analogue of /root/reference/examples/hdr/ and /eaw/: load an HDR frame
(EXR via the native codec, or a synthetic test image), decompose with
WCDF 9/7 (data-dependent weights), compress the approximation range and
boost details, reconstruct with the stored weights, save the result.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.eaw import eaw_wavedec2, eaw_waverec2
from libdwt_tpu.utils.exr import read_exr, write_exr
from libdwt_tpu.utils.testimg import test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--detail-boost", type=float, default=1.5)
    ap.add_argument("--base-compress", type=float, default=0.5)
    ap.add_argument("--input", default=None, help="input EXR (HDR) frame")
    ap.add_argument("--output", default=None, help="output EXR path")
    args = ap.parse_args()

    if args.input:
        raw, _ = read_exr(args.input)
        # luminance of RGB inputs, like the reference hdr example's
        # log-luminance pipeline
        lum = raw.mean(axis=2) if raw.ndim == 3 else raw
        img = jnp.asarray(np.log1p(np.maximum(lum, 0.0)).astype(np.float32))
    else:
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
    # golden-style predicates (the smoke test runs this program): the
    # weighted lifting must invert exactly and the manipulation must
    # stay finite
    assert err <= 1e-3, f"EAW identity reconstruction err {err}"
    assert bool(jnp.isfinite(out).all()), "tone-mapped output not finite"
    print(f"tone-mapped range: [{float(out.min()):.1f}, {float(out.max()):.1f}] "
          f"(input [{float(img.min()):.1f}, {float(img.max()):.1f}])")
    if args.output:
        write_exr(args.output, np.expm1(np.asarray(out, np.float32))
                  if args.input else np.asarray(out, np.float32))
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
