"""Chain-slope comparison of the streamed strip-kernel compute bodies
(VPU polyphase vs MXU banded matmuls) on the live device, at the bench
geometry.  One JSON line per candidate.

    python tools/ablate_body.py [--height 2144 --width 4096] [--levels 5]
        [--bodies poly,mxu] [--trials 6] [--strips 416]
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
    ap.add_argument("--bodies", default="poly,mxu")
    ap.add_argument("--strips", default="416")
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--chains", default="8,32")
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
    from libdwt_tpu.ops.streamed import streamed_wavedec2

    h, w, J = args.height, args.width, args.levels
    ka, kb = (int(s) for s in args.chains.split(","))
    print(f"# {jax.devices()[0].device_kind}  {h}x{w} J={J}",
          file=sys.stderr)
    stacks = _make_stacks((h, w), jnp.float32, ka, kb)
    px = h * w

    for ty in (int(s) for s in args.strips.split(",")):
        for body in args.bodies.split(","):
            name = f"streamed[{ty},{body}]:fwd"
            try:
                secs, kind = _chain_slope_secs(
                    lambda a, t=ty, b=body: streamed_wavedec2(
                        a, "cdf97", J, strip_rows=t, body=b),
                    stacks, trials=args.trials,
                )
            except Exception as e:
                print(json.dumps({"cand": name, "error": str(e)[:300]}))
                continue
            print(json.dumps({
                "cand": name,
                "ms_per_frame": round(secs * 1e3, 4),
                "gpix_s": round(px / secs / 1e9, 2),
                "estimator": kind,
            }))


if __name__ == "__main__":
    main()
