"""Performance sweep: secs/pixel and Mpix/s vs image size, TSV output.

Analogue of /root/reference/examples/perf-plot/perf.c (gnuplot-ready
output, min-of-N protocol).
"""
import argparse

from libdwt_tpu.api import wavedec2
from libdwt_tpu.utils.perf import info, measure_perf_2d, save_tsv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wavelet", default="cdf97")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--sizes", default="64,128,256,512,1024")
    ap.add_argument("--impl", default=None, choices=[None, "fused", "separable"])
    ap.add_argument("--out", default="/tmp/perf.tsv")
    args = ap.parse_args()

    print("system:", info())
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = measure_perf_2d(
        lambda x: wavedec2(x, args.wavelet, args.levels, impl=args.impl),
        sizes=sizes,
    )
    for n, spp, mpix in rows:
        print(f"  {n:5d}^2: {spp*1e9:8.2f} ns/pixel  {mpix:9.1f} Mpix/s")
    save_tsv(args.out, rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
