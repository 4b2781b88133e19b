"""Device self-test: run the round-trip matrix on the live backend.

Analogue of the reference's self-check layer — dwt_util_test (ASVP
worker echo test, /root/reference/src/libdwt.c:20114) and the
dwt_util_test_cdf97_2_* round-trip family (:23788-24334) exercised over
every kernel variant by examples/test/test.c:29-61.  Returns a report
dict; every entry must be True/0.0-ish on a healthy install.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["selftest"]


def selftest(size: int = 64, verbose: bool = False) -> Dict[str, bool]:
    """Round-trip every wavelet x dtype x impl combination the current
    device supports; returns {case_name: passed}."""
    from libdwt_tpu import REGISTRY, fdwt2, idwt2, wavedec2, waverec2
    from libdwt_tpu.ops.fused import fused_supported
    from libdwt_tpu.utils.testimg import EPS, test_image

    report: Dict[str, bool] = {}
    imgf = jnp.asarray(test_image(size, size, dtype=np.float32))
    imgi = jnp.asarray(test_image(size, size, dtype=np.int32))

    for name, wavelet in sorted(REGISTRY.items()):
        rec = idwt2(fdwt2(imgf, name, 3), name, 3)
        report[f"{name}_f32_packed"] = bool(
            jnp.abs(rec - imgf).max() <= EPS
        )
        rec = waverec2(wavedec2(imgf, name, 3), name)
        report[f"{name}_f32_pytree"] = bool(jnp.abs(rec - imgf).max() <= EPS)
        if wavelet.has_int:
            reci = idwt2(fdwt2(imgi, name, 3), name, 3)
            report[f"{name}_i32_exact"] = bool((reci == imgi).all())
        if fused_supported(name):
            from libdwt_tpu.ops.fused import fused_dwt2_level, fused_idwt2_level

            interp = jax.devices()[0].platform != "tpu"
            try:
                bands = fused_dwt2_level(imgf, name, interpret=interp)
                recf = fused_idwt2_level(*bands, name, interpret=interp)
                report[f"{name}_fused"] = bool(jnp.abs(recf - imgf).max() <= EPS)
            except Exception:
                report[f"{name}_fused"] = False

    if verbose:
        for k, ok in sorted(report.items()):
            print(f"  {'PASS' if ok else 'FAIL'} {k}")
    return report


if __name__ == "__main__":
    rep = selftest(verbose=True)
    bad = [k for k, v in rep.items() if not v]
    print(f"{len(rep) - len(bad)}/{len(rep)} self-tests passed on "
          f"{jax.devices()[0].device_kind}")
    raise SystemExit(1 if bad else 0)
