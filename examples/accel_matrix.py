"""The accel-matrix test app: every impl x dtype x layout, pass/fail.

Analogue of /root/reference/examples/test/test.c:29-61, which loops all
17 accel types x {in-place, out-of-place} x {float, double, int} at
256x256 and logs success/fail of the round-trip predicate.  Here the
accel axis is the kernel-strategy axis (impl=separable/fused/streamed,
plus the interleaved in-place layout), the dtype axis is
f32/f64/i32, and each cell runs fwd -> inv -> compare (float eps=1e-3,
/root/reference/src/libdwt.c:1593-1620; int exact).
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.api import waverec2, wavedec2
from libdwt_tpu.ops.interleaved import fdwt2_interleaved, idwt2_interleaved
from libdwt_tpu.utils.testimg import test_image


def roundtrip(impl, dtype, layout, size, levels, wavelet):
    x = jnp.asarray(test_image(size, size, dtype=dtype))
    if layout == "interleaved":
        y = fdwt2_interleaved(x, wavelet, levels)
        r = idwt2_interleaved(y, wavelet, levels)
    else:
        coeffs = wavedec2(x, wavelet, levels, impl=impl)
        r = waverec2(coeffs, wavelet, impl=impl)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return bool((np.asarray(r) == np.asarray(x)).all())
    return float(np.abs(np.asarray(r) - np.asarray(x)).max()) <= 1e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()

    cells = []
    for impl in ("separable", "fused", "streamed"):
        for dtype, wavelet in ((np.float32, "cdf97"), (np.float64, "cdf97"),
                               (np.int32, "cdf53")):
            if impl != "separable" and dtype == np.float64:
                continue  # accelerated paths are float32/int by design
            cells.append((impl, dtype, wavelet, "packed"))
    cells.append(("inplace", np.float32, "cdf53", "interleaved"))
    cells.append(("inplace", np.int32, "cdf53", "interleaved"))

    from libdwt_tpu.ops.streamed import streamed_supported

    failures = 0
    for impl, dtype, wavelet, layout in cells:
        if impl == "streamed" and not streamed_supported(
                (args.size, args.size), wavelet, 0,
                levels=min(args.levels, 2)):
            # the strip pipeline legitimately declines tiny frames
            # (>= 2 strips needed); the reference's accel types skip
            # unsupported configs the same way
            print(f"{impl:10s} {np.dtype(dtype).name:8s} {wavelet:6s} "
                  f"{layout:12s} skip (geometry)")
            continue
        try:
            ok = roundtrip(impl, dtype, layout, args.size, args.levels,
                           wavelet)
            msg = "ok" if ok else "FAIL (tolerance)"
        except Exception as e:  # noqa: BLE001 - the grid reports, like test.c
            ok, msg = False, f"FAIL ({type(e).__name__}: {str(e)[:50]})"
        failures += not ok
        print(f"{impl:10s} {np.dtype(dtype).name:8s} {wavelet:6s} "
              f"{layout:12s} {msg}")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
