"""1-D transform performance sweep: secs/sample vs signal length.

Analogue of /root/reference/examples/perf-plot-line (driver for
dwt_util_measure_perf_cdf97_1_s, /root/reference/src/libdwt.c:22388):
batches of rows per dispatch, min-of-N, TSV output.

    python examples/perf_line.py --lengths 256,1024,4096 --levels 4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="256,1024,4096,16384,65536")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--out", default="/tmp/perf_line.tsv")
    args = ap.parse_args()

    from libdwt_tpu import fdwt1
    from libdwt_tpu.utils.perf import info, measure_perf_1d, save_tsv

    print("system:", info())
    lengths = [int(s) for s in args.lengths.split(",")]
    rows = measure_perf_1d(
        lambda x: fdwt1(x, args.wavelet, args.levels),
        lengths=lengths, batch=args.batch, trials=args.trials,
    )
    for n, sps, msps in rows:
        print(f"  n={n:7d}: {sps * 1e9:8.2f} ns/sample "
              f"{msps:9.1f} Msamples/s")
    save_tsv(args.out, rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
