"""Tune the 'auto' dispatch table on the live device.

Runs the separable-vs-fused pyramid crossover measurement at each size
bucket (libdwt_tpu.autotune.tune_dispatch) and persists the winners to
the on-disk table that api._use_fused consults.  Run once per device
kind:

    python tools/tune.py [--sizes 256,512,1024,2048] [--out FILE]

The analogue of sweeping the reference's accel types with its perf
drivers and calling dwt_util_set_accel with the winner
(/root/reference/src/libdwt.h:1703-1726, examples/perf-plot*).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024,2048")
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--out", default=None, help="override tune-file path")
    ap.add_argument("--volume", default=None,
                    help="also tune the 3-D dispatch at Z,Y,X (e.g. "
                         "64,512,512)")
    ap.add_argument("--skip-2d", action="store_true",
                    help="skip the 2-D sweep (e.g. refresh only the "
                         "--volume entries; the 2-D sweep costs dozens "
                         "of ~20-60s remote compiles)")
    ap.add_argument("--packaged", action="store_true",
                    help="write straight into the packaged table "
                         "(libdwt_tpu/data/autotune.json) that ships with "
                         "the wheel and that fresh processes consult")
    args = ap.parse_args()
    if args.packaged:
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "libdwt_tpu", "data", "autotune.json",
        )
    if args.out:
        os.environ["LIBDWT_TPU_TUNE_FILE"] = args.out

    import jax

    # persistent compile cache: killed/retried tune runs resume instead
    # of re-paying the remote compiles (same knob bench.py uses)
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

    from libdwt_tpu import autotune

    # each size is a square edge ("1024") or an explicit HxW geometry
    # ("2144x4096" — tunes that bucket at the real bench frame shape)
    sizes = tuple(
        tuple(int(p) for p in s.split("x")) if "x" in s else int(s)
        for s in args.sizes.split(",")
    )
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    table = {}
    if not args.skip_2d:
        table = autotune.tune_dispatch(
            sizes=sizes,
            wavelet=args.wavelet,
            levels=args.levels,
            trials=args.trials,
        )
    if args.volume:
        shape3 = tuple(int(s) for s in args.volume.split(","))
        table = autotune.tune_dispatch3(
            shape3=shape3, wavelet=args.wavelet, trials=args.trials
        )
    print(json.dumps(table, indent=1, sort_keys=True))
    print(f"saved to {autotune.tune_file()}", file=sys.stderr)


if __name__ == "__main__":
    main()
