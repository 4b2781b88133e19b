"""Device self-test: run the round-trip matrix on the live backend.

Analogue of the reference's self-check layer — dwt_util_test (ASVP
worker echo test, /root/reference/src/libdwt.c:20114) and the
dwt_util_test_cdf97_2_* round-trip family (:23788-24334) exercised over
every kernel variant by examples/test/test.c:29-61.  Returns a report
dict; every entry must be True/0.0-ish on a healthy install.

Every case runs as ONE jitted program returning a scalar error —
op-by-op dispatch would poison the process's dispatch latency for its
whole life (CLAUDE.md timing landmine), and a live-backend diagnostic
must be safe to run before timed work.
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

    def max_err(fn, x):
        """One jitted program: transform, invert, scalar max|err|."""
        return float(jax.jit(lambda a: jnp.abs(fn(a) - a).max())(x))

    for name, wavelet in sorted(REGISTRY.items()):
        report[f"{name}_f32_packed"] = (
            max_err(lambda a, n=name: idwt2(fdwt2(a, n, 3), n, 3), imgf)
            <= EPS
        )
        report[f"{name}_f32_pytree"] = (
            max_err(lambda a, n=name: waverec2(wavedec2(a, n, 3), n), imgf)
            <= EPS
        )
        if wavelet.has_int:
            report[f"{name}_i32_exact"] = (
                max_err(lambda a, n=name: idwt2(fdwt2(a, n, 3), n, 3), imgi)
                == 0.0
            )
        if fused_supported(name):
            from libdwt_tpu.ops.fused import (
                fused_dwt2_level,
                fused_idwt2_level,
            )

            interp = jax.devices()[0].platform != "tpu"

            def rt_fused(a, n=name, interp=interp):
                bands = fused_dwt2_level(a, n, interpret=interp)
                return fused_idwt2_level(*bands, n, interpret=interp)

            try:
                report[f"{name}_fused"] = max_err(rt_fused, imgf) <= EPS
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
