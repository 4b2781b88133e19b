"""Time-frequency analysis of spectra-like signals with ridge tracking.

Analogue of /root/reference/examples/spectra-tf and time-freq: build a
chirp-like test signal, compute the S-transform and CWT planes, track
the dominant ridge with all three detectors, and report how well each
recovers the instantaneous frequency.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.gabor import (
    detect_ridges1,
    detect_ridges2,
    detect_ridges3,
    gabor_st,
    gabor_wt,
    phase_derivative,
    test_signal,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--bins", type=int, default=64)
    ap.add_argument("--signal", type=int, default=0,
                    help="test-signal type (see ops.gabor.test_signal)")
    ap.add_argument("--out", default=None, help="optional MAT dump of planes")
    args = ap.parse_args()

    sig = jnp.asarray(test_signal(args.size, args.signal))

    st_mag = gabor_st(sig, args.bins)
    st_arg = gabor_st(sig, args.bins, out="arg")
    wt_mag = gabor_wt(sig, args.bins, sigma=8.0, freq=np.pi / 2)

    r1 = detect_ridges1(st_mag)
    r2 = detect_ridges2(phase_derivative(st_arg))
    r3 = detect_ridges3(st_mag)

    peak_bin = np.asarray(jnp.argmax(st_mag, axis=0))
    mid = args.size // 2
    print(f"S-transform plane {st_mag.shape}, CWT plane {wt_mag.shape}")
    print(f"dominant bin at t={mid}: {int(peak_bin[mid])}/{args.bins}")
    for name, plane in (("ridges1(mag-peak)", r1),
                        ("ridges2(phase)", r2),
                        ("ridges3(2-D peak)", r3)):
        n_pts = int(np.asarray(plane).astype(bool).sum())
        print(f"{name}: {n_pts} ridge points")

    if args.out:
        from libdwt_tpu.utils.io import save_mat

        save_mat(args.out, np.asarray(st_mag))
        print(f"wrote {args.out}")

    raise SystemExit(0)


if __name__ == "__main__":
    main()
