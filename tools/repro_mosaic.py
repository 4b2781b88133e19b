"""Reproduce the round-2 Mosaic compile failure (tpu.concatenate
offset mismatch, 592x1024 vector) by compile-only lowering each bench
gate candidate at the bench geometry.  No eager dispatch (CLAUDE.md)."""
import os
import sys
import traceback

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

H, W = 2144, 4096
LEVELS = 5


def try_compile(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e)
        head = msg[:800]
        print(f"{name}: FAIL {type(e).__name__}: {head}", flush=True)
        return False


def main():
    from libdwt_tpu.api import wavedec2, waverec2
    from libdwt_tpu.ops.fused import (
        fused_dwt2_2level, fused_wavedec2, fused_waverec2,
    )
    from libdwt_tpu.ops.streamed import streamed_wavedec2, streamed_waverec2

    x = jax.ShapeDtypeStruct((H, W), jnp.float32)
    which = sys.argv[1:] or ["f2l", "fwd", "finv", "sfwd", "sinv"]

    if "f2l" in which:
        try_compile("fused_dwt2_2level@1072x2048",
                    lambda a: fused_dwt2_2level(a, "cdf97"),
                    jax.ShapeDtypeStruct((1072, 2048), jnp.float32))
    if "fwd" in which:
        try_compile("fused_wavedec2@4k", lambda a: fused_wavedec2(a, "cdf97", LEVELS), x)
    if "finv" in which:
        def rt(a):
            return fused_waverec2(fused_wavedec2(a, "cdf97", LEVELS), "cdf97")
        try_compile("fused_roundtrip@4k", rt, x)
    if "sfwd" in which:
        try_compile("streamed_wavedec2@4k",
                    lambda a: streamed_wavedec2(a, "cdf97", LEVELS), x)
    if "sinv" in which:
        def srt(a):
            return streamed_waverec2(streamed_wavedec2(a, "cdf97", LEVELS), "cdf97")
        try_compile("streamed_roundtrip@4k", srt, x)
    if "sinvonly" in which:
        coeffs_sd = jax.eval_shape(
            lambda a: streamed_wavedec2(a, "cdf97", LEVELS), x)
        try_compile("streamed_waverec2@4k",
                    lambda c: streamed_waverec2(c, "cdf97"), coeffs_sd)
    if "smxu" in which:
        try_compile("streamed_wavedec2_mxu@4k",
                    lambda a: streamed_wavedec2(a, "cdf97", LEVELS,
                                                body="mxu"), x)
    if "smxu2l" in which:
        try_compile("streamed_dwt2_2level_mxu@4k",
                    lambda a: __import__(
                        "libdwt_tpu.ops.streamed", fromlist=["x"]
                    ).streamed_dwt2_2level(a, "cdf97", body="mxu"), x)
    if "sinv2l" in which:
        from libdwt_tpu.ops.streamed import streamed_idwt2_2level

        c2 = jax.eval_shape(
            lambda a: __import__(
                "libdwt_tpu.ops.streamed", fromlist=["x"]
            ).streamed_dwt2_2level(a, "cdf97"), x)
        try_compile("streamed_idwt2_2level@4k",
                    lambda l, b2, b1: streamed_idwt2_2level(
                        l, b2, b1, "cdf97"), *c2)
    if "sinvdeep" in which:
        from libdwt_tpu.ops.streamed import streamed_waverec2_deep

        coeffs_sd = jax.eval_shape(
            lambda a: streamed_wavedec2(a, "cdf97", LEVELS), x)
        try_compile("streamed_waverec2_deep@4k",
                    lambda c: streamed_waverec2_deep(c, "cdf97"), coeffs_sd)
    if "finvonly" in which:
        coeffs_sd = jax.eval_shape(
            lambda a: fused_wavedec2(a, "cdf97", LEVELS), x)
        try_compile("fused_waverec2@4k",
                    lambda c: fused_waverec2(c, "cdf97"), coeffs_sd)


if __name__ == "__main__":
    main()
