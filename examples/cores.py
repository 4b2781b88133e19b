"""Single-loop core showcase: fast forward cores vs the separable inverse.

Analogue of /root/reference/examples/cores/main.c: fill a test image,
run a FAST forward core (fused strip kernel, non-separable NSLS core,
Haar / D4 registrations, or the fixed-point 1-D cores), reconstruct
with the SEPARABLE oracle, and report pass/fail + MSE — the
reference-twin predicate that every accelerated path must satisfy
(/root/reference/examples/cores/main.c:53-84).  Optionally dumps
source / log-subband / reconstruction PGMs like the C program.
"""
import argparse

import numpy as np

import jax.numpy as jnp
from libdwt_tpu.ops.fused import fused_dwt2_level, fused_supported
from libdwt_tpu.ops.nsls import nsls_dwt2_level
from libdwt_tpu.ops.separable import dwt2_level, idwt2_level
from libdwt_tpu.utils import fix
from libdwt_tpu.utils.io import save_pgm
from libdwt_tpu.utils.testimg import test_image


def _forward(core: str, img, wavelet: str):
    """Fast-core forward -> (ll, hl, lh, hh)."""
    if core == "fused":
        return fused_dwt2_level(img, wavelet, interpret=True)
    if core == "nsls":
        return nsls_dwt2_level(img, wavelet)
    if core == "separable":
        return dwt2_level(img, wavelet)
    raise SystemExit(f"unknown core {core!r}")


def _mse(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.mean(d * d))


def run_2d(core: str, wavelet: str, size: int, dump: bool) -> float:
    img = jnp.asarray(test_image(size, size))
    if dump:
        save_pgm("source.pgm", np.asarray(img))
    bands = _forward(core, img, wavelet)
    if dump:
        # log-magnitude subband mosaic, the image2_save_log_to_pgm look
        top = np.concatenate([np.asarray(bands[0]), np.asarray(bands[1])], 1)
        bot = np.concatenate([np.asarray(bands[2]), np.asarray(bands[3])], 1)
        mosaic = np.log1p(np.abs(np.concatenate([top, bot], 0)))
        save_pgm("subbands.pgm", mosaic / max(mosaic.max(), 1e-9))
    rec = idwt2_level(*bands, wavelet)  # inverse separable, as in main.c
    if dump:
        save_pgm("target.pgm", np.clip(np.asarray(rec), 0.0, 1.0))
    return _mse(img, rec)


def run_fix(qname: str, wavelet: str, size: int) -> float:
    """Fixed-point 1-D core round trip (the fix.h Q-format analogue)."""
    q = {"fix32": fix.FIX32, "fix16": fix.FIX16}[qname]
    sig = jnp.asarray(test_image(1, size)[0])
    s, d = fix.lift_fwd_fix(fix.to_fix(sig, q), wavelet, q)
    rec = fix.from_fix(fix.lift_inv_fix(s, d, wavelet, q), q)
    return _mse(sig, rec)


def run_fix2d(qname: str, wavelet: str, size: int) -> float:
    """Fixed-point 2-D core round trip (cores2f_cdf97_v2x2_i32 / the
    FIX16 5/3 variants, /root/reference/examples/cores/cores.h:17-60)."""
    q = {"fix32": fix.FIX32, "fix16": fix.FIX16}[qname]
    img = jnp.asarray(test_image(size, size))
    bands = fix.dwt2_fix(fix.to_fix(img, q), wavelet, q)
    rec = fix.from_fix(fix.idwt2_fix(*bands, wavelet, q), q)
    return _mse(img, rec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--core",
        default="all",
        choices=["all", "fused", "nsls", "separable", "fix32", "fix16",
                 "fix32-2d", "fix16-2d"],
    )
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dump", action="store_true", help="write PGM files")
    args = ap.parse_args()

    # tolerance ladder: floats reconstruct to FP noise, Q-formats to
    # their quantization step (same pragmatics as the C demo's eps)
    cases = []
    if args.core in ("all", "fused"):
        for wav in ("cdf97", "cdf53", "haar"):
            if fused_supported(wav):
                cases.append(("fused", wav, 1e-9))
    if args.core in ("all", "nsls"):
        cases.append(("nsls", "cdf97", 1e-9))
    if args.core in ("all", "separable"):
        for wav in ("cdf97", "cdf53", "haar", "d4"):
            cases.append(("separable", wav, 1e-9))
    if args.core in ("all", "fix32"):
        cases.append(("fix32", "cdf97", 1e-6))
    if args.core in ("all", "fix32-2d"):
        cases.append(("fix32-2d", "cdf97", 1e-6))
    if args.core in ("all", "fix16"):
        cases.append(("fix16", "cdf53", 1e-2))
    if args.core in ("all", "fix16-2d"):
        cases.append(("fix16-2d", "cdf53", 1e-2))

    failures = 0
    for core, wav, tol in cases:
        if core in ("fix32-2d", "fix16-2d"):
            mse = run_fix2d(core[:-3], wav, min(args.size, 128))
        elif core in ("fix32", "fix16"):
            mse = run_fix(core, wav, args.size)
        else:
            mse = run_2d(core, wav, args.size, args.dump and core == "fused")
        ok = mse <= tol
        failures += not ok
        print(f"{core:10s} {wav:7s} mse={mse:.3e}  {'pass' if ok else 'FAIL'}")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
