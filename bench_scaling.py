"""Multi-chip scaling-efficiency benchmark (BASELINE.md: >=80% at 2 hosts).

Measures the sharded 2-D MRA (shard_map + ppermute halo exchange) at
increasing space-axis sizes and reports throughput and scaling
efficiency vs the single-device run.  On a real TPU slice this measures
ICI/DCN halo-exchange overhead; on a single-chip or CPU environment it
runs on virtual devices (numbers then validate the harness, not the
interconnect — stated in the output).

Prints one JSON line per mesh size plus a summary line.
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from libdwt_tpu.parallel import make_mesh_2d, sharded_wavedec2

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    virtual = platform == "cpu"
    print(f"# {n_dev} x {jax.devices()[0].device_kind} "
          f"({'VIRTUAL - harness validation only' if virtual else 'real'})",
          file=sys.stderr)

    rng = np.random.RandomState(0)
    base = None
    results = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    for n_space in sizes:
        if args.height % (n_space * (1 << args.levels)):
            continue
        mesh = make_mesh_2d(1, n_space)
        x = jnp.asarray(rng.rand(args.height, args.width).astype(np.float32))
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P("space", None)))
        fn = jax.jit(
            lambda a, m=mesh: sharded_wavedec2(a, "cdf97", args.levels, mesh=m)
        )
        jax.block_until_ready(fn(x))
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            best = min(best, time.perf_counter() - t0)
        mpix = args.height * args.width / best / 1e6
        if base is None:
            base = mpix
        eff = mpix / (base * n_space)
        results.append((n_space, mpix, eff))
        print(json.dumps({
            "metric": "sharded_wavedec2_scaling",
            "n_space": n_space,
            "value": round(mpix, 1),
            "unit": "Mpix/s",
            "efficiency": round(eff, 3),
            "virtual": virtual,
        }))
    if len(results) > 1:
        print(f"# efficiency at {results[-1][0]} shards: "
              f"{results[-1][2]*100:.0f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
