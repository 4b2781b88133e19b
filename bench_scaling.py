"""Multi-chip scaling-efficiency benchmark (BASELINE.md: >=80% at 2 hosts).

Measures the sharded 2-D MRA (shard_map + ppermute halo exchange) at
increasing space-axis sizes and reports throughput and scaling
efficiency vs the single-device run.  On a real TPU slice this measures
ICI/DCN halo-exchange overhead; on a single-chip or CPU environment it
runs on virtual devices (numbers then validate the harness, not the
interconnect — stated in the output).

Protocol: the same two-length chain-slope discipline as bench.py —
each trial is one fenced dispatch of a scan over K stacked frames, the
per-frame time is the slope between two chain lengths, and completion
is forced by fetching a checksum scalar (``block_until_ready`` through
the remote transport can acknowledge work the device has not finished;
a single unchained dispatch would measure the ~25-30 ms transport round
trip, not the transform).  The timed transform is validated against
the single-device separable oracle once per mesh size (the
reference-twin rule; a halo-exchange bug must not ship a fast number).

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
    ap.add_argument("--chains", default="4,12",
                    help="two chain lengths for the slope protocol")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={args.virtual}"
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
        elif want not in flags:
            print(f"# WARNING: XLA_FLAGS already pins a device count and it "
                  f"is not {args.virtual}; honouring the environment",
                  file=sys.stderr)

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from libdwt_tpu.autotune import _checksummed
    from libdwt_tpu.parallel import make_mesh_2d, sharded_wavedec2

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    virtual = platform == "cpu"
    print(f"# {n_dev} x {jax.devices()[0].device_kind} "
          f"({'VIRTUAL - harness validation only' if virtual else 'real'})",
          file=sys.stderr)

    ka, kb = (int(s) for s in args.chains.split(","))
    rng = np.random.RandomState(0)
    base = None
    results = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    for n_space in sizes:
        if args.height % (n_space * (1 << args.levels)):
            continue
        mesh = make_mesh_2d(1, n_space)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, "space", None))
        stacks = {
            k: jax.device_put(
                jnp.asarray(
                    rng.rand(k, args.height, args.width).astype(np.float32)
                ),
                sharding,
            )
            for k in (ka, kb)
        }

        def chain(stack, m=mesh):
            def body(_, x):
                s, _tree = _checksummed(
                    sharded_wavedec2(x, "cdf97", args.levels, mesh=m)
                )
                return None, s

            return jnp.sum(jax.lax.scan(body, None, stack)[1])

        fn = jax.jit(chain)
        for k in (ka, kb):
            float(jax.device_get(fn(stacks[k])))  # compile + warm
        best = {ka: float("inf"), kb: float("inf")}
        for _ in range(args.trials):
            for k in (ka, kb):
                t0 = time.perf_counter()
                out = fn(stacks[k])
                float(jax.device_get(out))  # completion fence
                best[k] = min(best[k], time.perf_counter() - t0)
        slope = (best[kb] - best[ka]) / (kb - ka)
        upper = best[kb] / kb
        secs = slope if 0.05 * upper < slope <= upper else upper

        # reference-twin gate: the timed sharded transform must match
        # the single-device oracle (one frame, float tolerance)
        from libdwt_tpu.ops.separable import wavedec2 as sep_wavedec2

        x0 = stacks[ka][0]
        got = jax.jit(
            lambda a, m=mesh: sharded_wavedec2(a, "cdf97", args.levels,
                                               mesh=m)
        )(x0)
        want = jax.jit(lambda a: sep_wavedec2(a, "cdf97", args.levels))(x0)
        diffs = [
            float(jnp.max(jnp.abs(g - w)))
            for g, w in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want))
        ]
        ok = max(diffs) <= 5e-4

        # collective accounting: the per-frame ICI traffic this mesh
        # size issues (counts pin the halved-collective schedule; bytes
        # are per shard per frame) — the quantity the efficiency curve
        # is paying for
        from libdwt_tpu.parallel.comm_stats import collective_stats

        comm = collective_stats(
            lambda a, m=mesh: sharded_wavedec2(a, "cdf97", args.levels,
                                               mesh=m), x0)

        mpix = args.height * args.width / secs / 1e6
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
            "oracle_max_diff": round(max(diffs), 8),
            "gate_ok": ok,
            "collectives_per_frame": comm,
            "virtual": virtual,
        }))
    if len(results) > 1:
        print(f"# efficiency at {results[-1][0]} shards: "
              f"{results[-1][2]*100:.0f}%", file=sys.stderr)

    # ---- 2-D block meshes (rows x cols): same protocol and gate over
    # the two-axis halo exchange (sharded_wavedec2 col_axis path)
    from libdwt_tpu.parallel import make_mesh_blocks
    from jax.sharding import NamedSharding, PartitionSpec as P

    for n_rows, n_cols in ((2, 2), (2, 4), (4, 2)):
        if n_rows * n_cols > n_dev:
            continue
        if (args.height % (n_rows * (1 << args.levels))
                or args.width % (n_cols * (1 << args.levels))):
            continue
        bmesh = make_mesh_blocks(1, n_rows, n_cols)
        sharding = NamedSharding(bmesh, P(None, "rows", "cols"))
        stacks = {
            k: jax.device_put(
                jnp.asarray(
                    rng.rand(k, args.height, args.width).astype(np.float32)
                ),
                sharding,
            )
            for k in (ka, kb)
        }

        def bchain(stack, m=bmesh):
            def body(_, x):
                s, _tree = _checksummed(
                    sharded_wavedec2(x, "cdf97", args.levels, mesh=m,
                                     space_axis="rows", col_axis="cols")
                )
                return None, s

            return jnp.sum(jax.lax.scan(body, None, stack)[1])

        fn = jax.jit(bchain)
        for k in (ka, kb):
            float(jax.device_get(fn(stacks[k])))
        best = {ka: float("inf"), kb: float("inf")}
        for _ in range(args.trials):
            for k in (ka, kb):
                t0 = time.perf_counter()
                out = fn(stacks[k])
                float(jax.device_get(out))
                best[k] = min(best[k], time.perf_counter() - t0)
        slope = (best[kb] - best[ka]) / (kb - ka)
        upper = best[kb] / kb
        secs = slope if 0.05 * upper < slope <= upper else upper

        from libdwt_tpu.ops.separable import wavedec2 as sep_wavedec2

        x0 = stacks[ka][0]
        got = jax.jit(
            lambda a, m=bmesh: sharded_wavedec2(
                a, "cdf97", args.levels, mesh=m,
                space_axis="rows", col_axis="cols",
            )
        )(x0)
        want = jax.jit(lambda a: sep_wavedec2(a, "cdf97", args.levels))(x0)
        diffs = [
            float(jnp.max(jnp.abs(g - w)))
            for g, w in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want))
        ]
        ok = max(diffs) <= 5e-4
        from libdwt_tpu.parallel.comm_stats import collective_stats

        comm = collective_stats(
            lambda a, m=bmesh: sharded_wavedec2(
                a, "cdf97", args.levels, mesh=m,
                space_axis="rows", col_axis="cols"), x0)
        mpix = args.height * args.width / secs / 1e6
        eff = mpix / (base * n_rows * n_cols) if base else float("nan")
        print(json.dumps({
            "metric": "sharded_wavedec2_scaling",
            "mesh": [n_rows, n_cols],
            "value": round(mpix, 1),
            "unit": "Mpix/s",
            "efficiency": round(eff, 3),
            "oracle_max_diff": round(max(diffs), 8),
            "gate_ok": ok,
            "collectives_per_frame": comm,
            "virtual": virtual,
        }))


if __name__ == "__main__":
    main()
