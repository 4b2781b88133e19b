"""Optical-distortion displacement-field interpolation.

Analogue of /root/reference/examples/displ-vectors/vectors.c: a sparse
regular grid of displacement vectors (dx, dy) is treated as the LL_j
approximation band of a j-level pyramid; j levels of INVERSE transform
with zeroed detail bands upsample the field to the full sensor
resolution (wavelet interpolation).  Optionally only the N largest
wavelet coefficients of the field are kept first (sparse denoise of the
distortion model).
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import fdwt2, idwt2
from libdwt_tpu.utils.io import save_mat


def synth_field(count: int, seed: int = 0):
    """Synthetic barrel distortion + noise, sampled on a count x count grid."""
    t = np.linspace(-1.0, 1.0, count, dtype=np.float32)
    yy, xx = np.meshgrid(t, t, indexing="ij")
    r2 = xx**2 + yy**2
    k = 12.0  # pixels of distortion at the corners
    dx = k * xx * r2
    dy = k * yy * r2
    rng = np.random.RandomState(seed)
    dx += 0.2 * rng.randn(count, count).astype(np.float32)
    dy += 0.2 * rng.randn(count, count).astype(np.float32)
    return dx.astype(np.float32), dy.astype(np.float32)


def keep_n_largest(y, n: int):
    """Zero all but the n largest-magnitude coefficients (keeps the
    reference's qsort-and-threshold semantics)."""
    flat = jnp.abs(y).reshape(-1)
    if n >= flat.shape[0]:
        return y
    thr = jnp.sort(flat)[-n]
    return jnp.where(jnp.abs(y) >= thr, y, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=16,
                    help="samples per grid edge")
    ap.add_argument("--levels", type=int, default=5,
                    help="levels of inverse transform (upsample factor 2^j)")
    ap.add_argument("--keep", type=int, default=-1,
                    help="keep N largest wavelet coefficients (-1 = all)")
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--out", default="/tmp/displ_field.mat")
    args = ap.parse_args()

    dx, dy = synth_field(args.count)
    full = args.count << args.levels
    print(f"input grid {args.count}x{args.count} -> output {full}x{full} "
          f"({args.levels} inverse levels)")

    # DC gain of the J-level lowpass chain (depends on the wavelet's
    # scaling convention): embed grid * gain so the interpolated field
    # keeps the input's amplitude at the sample points
    gain = float(fdwt2(jnp.ones((full, full), jnp.float32),
                       args.wavelet, args.levels)[0, 0])

    fields = []
    for name, grid in (("dx", dx), ("dy", dy)):
        g = jnp.asarray(grid)
        if args.keep >= 0:
            # denoise the coarse field in its own wavelet domain first
            coeffs = fdwt2(g, args.wavelet, None)
            g = idwt2(keep_n_largest(coeffs, args.keep), args.wavelet, None)
        # embed as LL_j of the fine pyramid: packed layout, zero details
        y = jnp.zeros((full, full), jnp.float32)
        y = y.at[: args.count, : args.count].set(g * gain)
        field = idwt2(y, args.wavelet, args.levels)
        fields.append(np.asarray(field))
        print(f"  {name}: range [{field.min():.2f}, {field.max():.2f}] px")

    out = np.stack(fields)  # (2, full, full)
    save_mat(args.out, out.reshape(2 * full, full))
    print(f"saved interpolated field to {args.out}")


if __name__ == "__main__":
    main()
