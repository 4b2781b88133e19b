"""Print the h/g (analysis lowpass/highpass) filter coefficients of a
lifting wavelet by transforming unit impulses.

Analogue of /root/reference/examples/filter-coeffs/wavelet.c: a forward
transform of the unit vector delta[i] reads out one column of the
analysis polyphase matrix; sweeping the impulse position recovers the
equivalent FIR filters of the lifting factorization.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu import dwt1


def analysis_filters(wavelet: str, size: int = 16):
    """(h, g): equivalent analysis lowpass/highpass FIR coefficients,
    read from impulse responses at the center of a ``size`` signal
    (large enough that borders do not reach it)."""
    lo_taps = {}
    hi_taps = {}
    center_lo = size // 4  # low channel index fed by the centred impulse
    for pos in range(size):
        x = np.zeros(size, np.float32)
        x[pos] = 1.0
        lo, hi = dwt1(jnp.asarray(x), wavelet)
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        # h[k]: contribution of x[2*center_lo - k] to lo[center_lo]
        lo_taps[2 * center_lo - pos] = float(lo[center_lo])
        hi_taps[2 * center_lo + 1 - pos] = float(hi[center_lo])
    trim = lambda d: {k: v for k, v in d.items() if abs(v) > 1e-7}
    return trim(lo_taps), trim(hi_taps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wavelet", default="cdf97")
    args = ap.parse_args()

    h, g = analysis_filters(args.wavelet)
    print(f"# {args.wavelet} analysis filters (tap offset: coefficient)")
    print("h (lowpass):")
    for k in sorted(h):
        print(f"  h[{k:+d}] = {h[k]:+.9f}")
    print("g (highpass):")
    for k in sorted(g):
        print(f"  g[{k:+d}] = {g[k]:+.9f}")
    # sanity: lowpass DC gain equals the scaling normalization
    print(f"sum(h) = {sum(h.values()):.6f}  sum(g) = {sum(g.values()):+.2e}")


if __name__ == "__main__":
    main()
