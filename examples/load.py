"""Load an image from a PGM file, transform it, save the results.

Analogue of /root/reference/examples/load/simple.c (and load-int via
--dtype i32): try to load the named PGM; on failure fall back to the
synthetic test image exactly like the reference.  Print the environment
info lines (the dwt_util_log block, simple.c:44-53), run a full forward
decomposition, save the viewable transform and the reconstruction as
PGM, and verify the round trip.
"""
import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
from libdwt_tpu import __version__, fdwt2, idwt2
from libdwt_tpu.image import conv_show
from libdwt_tpu.utils.io import load_pgm, save_pgm
from libdwt_tpu.utils.subband import j_limit
from libdwt_tpu.utils.testimg import EPS, test_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="Lenna.pgm")
    ap.add_argument("--dtype", default="f32", choices=["f32", "i32"])
    ap.add_argument("--out", default=".", help="output directory")
    args = ap.parse_args()

    try:
        data = load_pgm(args.path, normalize=args.dtype == "f32")
        print(f"loaded {args.path}")
    except (OSError, ValueError):
        print(f"unable to load {args.path!r}, using the default test image")
        data = test_image(512, 512, dtype=np.float32)
    if args.dtype == "i32":
        scale = 255.0 if data.max() <= 1.0 else 1.0
        data = np.round(data * scale).astype(np.int32)
    img = jnp.asarray(data)

    dev = jax.devices()[0]
    y, x = img.shape
    print(f"library version {__version__}")
    print(f"running on {dev.platform}:{dev.device_kind}")
    print(f"node {os.uname().nodename}")
    print(f"image {y}x{x} pixels, {img.dtype}, "
          f"{img.size * img.dtype.itemsize // 1024} KiB")

    wavelet = "cdf97" if args.dtype == "f32" else "cdf53"
    j = j_limit(y, x)  # full decomposition (reference j = -1)
    coeffs = fdwt2(img, wavelet, j)
    rec = idwt2(coeffs, wavelet, j)

    os.makedirs(args.out, exist_ok=True)
    save_pgm(os.path.join(args.out, "transform.pgm"), conv_show(coeffs))
    peak = 255 if args.dtype == "i32" else 1.0
    save_pgm(os.path.join(args.out, "reconstruction.pgm"),
             np.asarray(rec, np.float64) / peak)

    err = float(np.abs(np.asarray(rec, np.float64)
                       - np.asarray(img, np.float64)).max())
    ok = err == 0 if args.dtype == "i32" else err <= EPS
    print(f"{wavelet} J={j} round trip: max abs err = {err:.2e} -> "
          f"{'OK' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
