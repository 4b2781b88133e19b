"""Bounded probe of the lane-paneled 'two' dot emission at 4K.

Round 4 established that the interleaved 'two'/'fused' emissions hang
Mosaic at 4K because per-dot compile cost is ~quadratic in operand
lane width; round 5 lane-panels the emissions (ops/banded.DOT_PANEL).
This probe validates the fix on the live toolchain: for each requested
(emission, panel) config it launches a SUBPROCESS with a hard timeout
that compiles the deep streamed MXU kernel at the bench geometry,
reports compile seconds, then chain-slope-measures per-frame time —
so a compile wedge costs the timeout, never the session.

  python tools/probe_two_emission.py --configs two:1024 two:512 three:0 \
      --timeout 1500 [--inv] [--geom 2144x4096] [--levels 5]

Prints one JSON line per config plus a summary.
"""
import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import json, os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from libdwt_tpu.ops.streamed import streamed_wavedec2_deep, streamed_waverec2_deep
from libdwt_tpu.ops import banded

h, w, levels = {h}, {w}, {levels}
res = {{"emission": banded._mode(), "panel": banded.DOT_PANEL,
        "geom": [h, w], "inv": {inv}}}

def fwd(x):
    return streamed_wavedec2_deep(x, "cdf97", levels, body="mxu")

if {inv}:
    def run(c):
        return streamed_waverec2_deep(c, "cdf97", body="mxu")
    coeffs_sd = jax.eval_shape(fwd, jax.ShapeDtypeStruct((h, w), np.float32))
    arg_sd = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), coeffs_sd)
else:
    run = fwd
    arg_sd = jax.ShapeDtypeStruct((h, w), np.float32)

t0 = time.time()
compiled = jax.jit(run).lower(arg_sd).compile()
res["compile_s"] = round(time.time() - t0, 1)
print("COMPILED", json.dumps(res), flush=True)

# chain-slope measure (CLAUDE.md: one process, back-to-back)
rng = np.random.RandomState(0)
KA, KB = 4, 12
xs = {{k: jnp.asarray(rng.rand(k, h, w).astype(np.float32)) for k in (KA, KB)}}

def chain(stack):
    def body(_, x):
        out = fwd(x)
        if {inv}:
            out = run(out)
        leaves = jax.lax.optimization_barrier(
            tuple(jax.tree_util.tree_leaves(out)))
        return None, sum(l.reshape(-1)[0] for l in leaves)
    return jnp.sum(jax.lax.scan(body, None, stack)[1])

cf = jax.jit(chain)
for k in (KA, KB):
    float(cf(xs[k]))
best = {{KA: 1e9, KB: 1e9}}
for _ in range(8):
    for k in (KA, KB):
        t = time.perf_counter()
        float(cf(xs[k]))
        best[k] = min(best[k], time.perf_counter() - t)
slope = (best[KB] - best[KA]) / (KB - KA)
upper = best[KB] / KB
per = slope if 0 < slope <= upper else upper
res["ms_per_frame"] = round(per * 1e3, 4)
res["estimator"] = "slope" if 0 < slope <= upper else "upper"
res["raw_ms"] = [round(best[KA] * 1e3, 2), round(best[KB] * 1e3, 2)]
print("RESULT", json.dumps(res), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["two:1024"],
                    help="emission:panel pairs, e.g. two:1024 three:0")
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--geom", default="2144x4096")
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--inv", action="store_true")
    args = ap.parse_args()

    h, w = (int(t) for t in args.geom.split("x"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".jax_cache")
    results = []
    for cfg in args.configs:
        emission, panel = cfg.split(":")
        env = dict(os.environ)
        env["LIBDWT_TPU_DOT_EMISSION"] = emission
        env["LIBDWT_TPU_DOT_PANEL"] = panel
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        code = _CHILD.format(h=h, w=w, levels=args.levels,
                             inv=bool(args.inv), cache=cache)
        print(f"# probing {cfg} ({'inv' if args.inv else 'fwd'}, "
              f"timeout {args.timeout:.0f}s)", file=sys.stderr, flush=True)
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], env=env, cwd=root,
                capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            compiled = [ln for ln in out.splitlines()
                        if ln.startswith("COMPILED")]
            results.append({"config": cfg, "status": "timeout",
                            "compiled": bool(compiled)})
            print(json.dumps(results[-1]), flush=True)
            continue
        lines = res.stdout.splitlines()
        payload = next((ln[7:] for ln in reversed(lines)
                        if ln.startswith("RESULT")), None)
        if res.returncode == 0 and payload:
            entry = json.loads(payload)
            entry["config"] = cfg
            entry["status"] = "ok"
            results.append(entry)
        else:
            tail = (res.stderr or res.stdout).strip().splitlines()
            results.append({"config": cfg, "status": "error",
                            "rc": res.returncode,
                            "tail": tail[-3:] if tail else []})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"summary": results}, indent=1))


if __name__ == "__main__":
    main()
