"""Minimal repro for the Mosaic FUSED_DOT compiler hang (BENCH_NOTES
round 3): the 4-way row/column-interleaved bf16 split-product emission
(ops/banded.py apply_packed, FUSED_DOT=True) compiles in small probes
but HANGS Mosaic (>45 min, no error) at the full 4K streamed-kernel
scale; the separate 3-dot emission always compiles.

This strips the streamed machinery away: ONE Pallas kernel that builds
the interleaved operand x4 = rows(xhi, xlo, xhi, xlo) from an (n, c)
f32 input and issues --dots banded blocks (128, wmax)@(4*wmax, c) as
either one fused bf16 dot each (--mode fused) or the 3-dot fallback
(--mode three).  Compile-only (no dispatch); SIGALRM bounds the wait.

  python tools/repro_fused_dot.py --mode fused --dots 24 --cols 4096 \
      --timeout 300

Exit 0 = compiled (prints seconds), 2 = still compiling at the alarm
(the hang signature).  Scale --dots/--cols to find the wall.

``--mode two`` probes the middle ground: a 2-way row interleave
(xhi, xlo) x column-interleaved (Whi, Whi) covers the Whi@xhi +
Whi@xlo terms in ONE dot, with Wlo@xhi as a second plain dot — 2 MXU
passes per block instead of 3, still a power-of-two interleave group.
"""
import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, BLOCK = 512, 128  # window sublanes (the ty=480/tyw=512 strip), block rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("fused", "two", "three"),
                    default="fused")
    ap.add_argument("--dots", type=int, default=24,
                    help="banded blocks per kernel (the 4K streamed "
                         "2-level kernel emits ~O(100))")
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--wmax", type=int, default=256,
                    help="window sublanes per block (128-multiple)")
    ap.add_argument("--timeout", type=int, default=300)
    args = ap.parse_args()
    c, wmax, m = args.cols, args.wmax, args.dots
    rng = np.random.RandomState(0)
    wf = rng.rand(m, BLOCK, wmax).astype(np.float32) * 0.5
    import ml_dtypes

    hi = wf.astype(ml_dtypes.bfloat16)
    lo = (wf - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    if args.mode == "fused":
        W = np.empty((m, BLOCK, 4 * wmax), ml_dtypes.bfloat16)
        W[..., 0::4] = hi
        W[..., 1::4] = hi
        W[..., 2::4] = lo
        W[..., 3::4] = lo
    elif args.mode == "two":
        # [Whi interleaved 2-way | Wlo]: dot1 covers Whi@(xhi+xlo),
        # dot2 the Wlo@xhi correction
        W = np.empty((m, BLOCK, 3 * wmax), ml_dtypes.bfloat16)
        W[..., 0 : 2 * wmax : 2] = hi
        W[..., 1 : 2 * wmax : 2] = hi
        W[..., 2 * wmax :] = lo
    else:
        W = np.concatenate([hi, lo], axis=-1)
    starts = [(i * 64) % (N - wmax) // 8 * 8 for i in range(m)]

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]
        xhi = x.astype(jnp.bfloat16)
        xlo = (x - xhi.astype(x.dtype)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if args.mode == "fused":
            x4 = jnp.concatenate(
                [xhi.reshape(N, 1, c), xlo.reshape(N, 1, c),
                 xhi.reshape(N, 1, c), xlo.reshape(N, 1, c)], axis=1
            ).reshape(4 * N, c)
            for i, s in enumerate(starts):
                win = jax.lax.slice_in_dim(x4, 4 * s, 4 * (s + wmax), axis=0)
                o_ref[pl.ds(i * BLOCK, BLOCK), :] = dot(w_ref[i], win)
        elif args.mode == "two":
            x2 = jnp.concatenate(
                [xhi.reshape(N, 1, c), xlo.reshape(N, 1, c)], axis=1
            ).reshape(2 * N, c)
            for i, s in enumerate(starts):
                win2 = jax.lax.slice_in_dim(x2, 2 * s, 2 * (s + wmax),
                                            axis=0)
                winh = jax.lax.slice_in_dim(xhi, s, s + wmax, axis=0)
                o_ref[pl.ds(i * BLOCK, BLOCK), :] = (
                    dot(w_ref[i, :, : 2 * wmax], win2)
                    + dot(w_ref[i, :, 2 * wmax :], winh))
        else:
            for i, s in enumerate(starts):
                hw = jax.lax.slice_in_dim(xhi, s, s + wmax, axis=0)
                lw = jax.lax.slice_in_dim(xlo, s, s + wmax, axis=0)
                whi, wlo = w_ref[i, :, :wmax], w_ref[i, :, wmax:]
                o_ref[pl.ds(i * BLOCK, BLOCK), :] = (
                    dot(whi, hw) + dot(whi, lw) + dot(wlo, hw))

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m * BLOCK, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    def on_alarm(s, f):
        print(f"{args.mode} dots={m} cols={c}: HANG "
              f"(still compiling at {args.timeout}s)", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(args.timeout)
    t0 = time.time()
    jax.jit(fn).lower(
        jax.ShapeDtypeStruct((N, c), jnp.float32), jnp.asarray(W)
    ).compile()
    print(f"{args.mode} dots={m} cols={c}: compiled in "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
