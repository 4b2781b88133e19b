"""Census of the MXU dot emissions a kernel would ask Mosaic to compile.

Traces (never compiles) the streamed MXU-body kernels at a given
geometry and tallies every ``dot_general`` in the nested jaxprs by
operand lane width, then predicts compile time from the round-4
bisection cost model (tools/repro_fused_dot.py, BENCH_NOTES):
interleaved-operand dots cost ~1.15 s at 1024 lanes and scale
~quadratically with lane width; plain dots ~1 s at 4096 lanes.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  LIBDWT_TPU_DOT_EMISSION=two LIBDWT_TPU_DOT_PANEL=1024 \
  python tools/count_dots.py [--h 2144] [--w 4096] [--levels 5] [--inv]
"""
import argparse
import collections
import sys

import numpy as np

import jax

sys.path.insert(0, ".")


def iter_eqns(jaxpr):
    from jax.extend import core as jex_core

    for eqn in jaxpr.eqns:
        yield eqn
        for val in eqn.params.values():
            vals = val if isinstance(val, (tuple, list)) else [val]
            for v in vals:
                # pallas_call stores a raw Jaxpr; control flow stores
                # ClosedJaxprs (whose .jaxpr is the raw one)
                core = getattr(v, "jaxpr", v)
                if isinstance(core, jex_core.Jaxpr) or hasattr(core, "eqns"):
                    yield from iter_eqns(core)


def census(fn, *args):
    jx = jax.make_jaxpr(fn)(*args)
    dots = collections.Counter()
    for eqn in iter_eqns(jx.jaxpr):
        if eqn.primitive.name != "dot_general":
            continue
        a, b = eqn.invars[0].aval, eqn.invars[1].aval
        # (m, k) @ (k, c): lane width = c; 'interleaved' heuristic =
        # bf16 operands (the split-product emissions are all-bf16)
        lanes = b.shape[-1]
        kind = "bf16" if str(a.dtype) == "bfloat16" else str(a.dtype)
        dots[(kind, lanes)] += 1
    return dots


def predict_secs(dots, mode):
    """Round-4 bisection model (tools/repro_fused_dot.py): a dot on a
    row-INTERLEAVED operand costs ~1.15 s at 1024 lanes, quadratic in
    lane width; a plain dot ~1 s at 4096 lanes, quadratic.  The CPU
    census sees f32 (interpret upcast), so interleavedness comes from
    the emission mode: 'fused' = every dot interleaved, 'two' = one of
    each block's two dots (the Wlo@xhi correction operand is plain),
    'three' = none."""
    frac = {"three": 0.0, "two": 0.5, "fused": 1.0}[mode]
    total = 0.0
    for (_kind, lanes), n in sorted(dots.items()):
        inter = 1.15 * (lanes / 1024.0) ** 2
        plain = 1.0 * (lanes / 4096.0) ** 2
        total += n * (frac * inter + (1.0 - frac) * plain)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=2144)
    ap.add_argument("--w", type=int, default=4096)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--inv", action="store_true")
    ap.add_argument("--strip", type=int, default=0)
    args = ap.parse_args()

    from libdwt_tpu.ops import banded
    from libdwt_tpu.ops.streamed import (
        streamed_wavedec2_deep, streamed_waverec2_deep,
    )

    print(f"emission={banded._mode()} panel={banded.DOT_PANEL} "
          f"geom={args.h}x{args.w} J={args.levels} "
          f"{'inv' if args.inv else 'fwd'}")
    x = jax.ShapeDtypeStruct((args.h, args.w), np.float32)

    if args.inv:
        coeffs = jax.eval_shape(
            lambda a: streamed_wavedec2_deep(
                a, "cdf97", args.levels, interpret=True), x)

        def fn(c):
            return streamed_waverec2_deep(
                c, "cdf97", strip_rows=args.strip, interpret=True,
                body="mxu")

        dots = census(fn, coeffs)
    else:
        def fn(a):
            return streamed_wavedec2_deep(
                a, "cdf97", args.levels, strip_rows=args.strip,
                interpret=True, body="mxu")

        dots = census(fn, x)

    total = 0
    for (kind, lanes), n in sorted(dots.items()):
        print(f"  {kind:>8} lanes={lanes:<6} x {n}")
        total += n
    print(f"total dots: {total}; predicted Mosaic compile "
          f"~{predict_secs(dots, banded._mode()):.0f} s "
          "(round-4 cost model)")


if __name__ == "__main__":
    main()
