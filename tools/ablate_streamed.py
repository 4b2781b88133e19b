"""Strip-size ablation for the streamed whole-pyramid kernels on the
live device (one process — cross-process timings drift up to 3x).

Chain-slope measures streamed_wavedec2{,_deep} forward and inverse at
several strip sizes at the bench geometry, plus the fused and separable
baselines, and prints one JSON line per candidate.  Feed the winner to
``pick_strip``'s default / the dispatch table.

    python tools/ablate_streamed.py [--height 2144 --width 4096]
        [--levels 5] [--strips 128,256,416,512] [--trials 6]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=2144)
    ap.add_argument("--width", type=int, default=4096)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--strips", default="128,256,416,512")
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--chains", default="8,32")
    ap.add_argument(
        "--only", default="",
        help="comma-separated candidate-name prefixes to run (e.g. "
        "'streamed' or 'streamed[416]:fwd'); keeps remote compile "
        "batches small (CLAUDE.md: ~4-6 pallas compiles per run)",
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from libdwt_tpu.autotune import _chain_slope_secs, _make_stacks
    from libdwt_tpu.ops.fused import fused_wavedec2, fused_waverec2
    from libdwt_tpu.ops.separable import wavedec2 as sep_dec
    from libdwt_tpu.ops.separable import waverec2 as sep_rec
    from libdwt_tpu.ops.streamed import streamed_wavedec2, streamed_waverec2

    h, w, J = args.height, args.width, args.levels
    strips = [int(s) for s in args.strips.split(",")]
    ka, kb = (int(s) for s in args.chains.split(","))
    print(f"# {jax.devices()[0].device_kind}  {h}x{w} J={J}",
          file=sys.stderr)
    stacks = _make_stacks((h, w), jnp.float32, ka, kb)
    px = h * w

    cands = [
        ("separable:fwd", lambda a: sep_dec(a, "cdf97", J)),
        ("separable:inv",
         lambda a: sep_rec(sep_dec(a, "cdf97", J), "cdf97")),
        ("fused:fwd", lambda a: fused_wavedec2(a, "cdf97", J)),
        ("fused:inv",
         lambda a: fused_waverec2(sep_dec(a, "cdf97", J), "cdf97")),
    ]
    for ty in strips:
        cands.append((
            f"streamed[{ty}]:fwd",
            lambda a, t=ty: streamed_wavedec2(a, "cdf97", J, strip_rows=t),
        ))
        cands.append((
            f"streamed[{ty}]:inv",
            lambda a, t=ty: streamed_waverec2(
                sep_dec(a, "cdf97", J), "cdf97", strip_rows=t
            ),
        ))

    if args.only:
        prefixes = tuple(p.strip() for p in args.only.split(",") if p.strip())
        cands = [c for c in cands if c[0].startswith(prefixes)]

    for name, fn in cands:
        try:
            secs, kind = _chain_slope_secs(fn, stacks, trials=args.trials)
        except Exception as e:  # device-dependent geometry limits
            print(json.dumps({"cand": name, "error": str(e)[:120]}))
            continue
        print(json.dumps({
            "cand": name,
            "ms_per_frame": round(secs * 1e3, 4),
            "gpix_s": round(px / secs / 1e9, 2),
            "estimator": kind,
        }))


if __name__ == "__main__":
    main()
