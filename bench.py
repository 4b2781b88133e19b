"""Headline benchmark: Mpix/s/chip for 4K multi-level CDF 9/7 2-D DWT.

Protocol: the reference's min-of-N discipline
(/root/reference/src/libdwt.c:21441-21517) — which times forward AND
inverse — adapted to a remote-attached device: each trial is ONE
blocking dispatch of a jitted program that computes CHAIN independent
pyramid transforms over CHAIN distinct resident frames (a
``lax.scan`` over a stacked batch).  Blocking per dispatch is the
conservative choice (enqueue-style pipelining is not auditable through
this transport); chaining amortizes the ~50-100 us dispatch-latency
floor over CHAIN frames exactly like the reference's M-image working
sets amortize its harness overhead (/root/reference/src/libdwt.c:21449).

Config: 4K frame (2144x4096 after J=5 alignment), f32, CDF 9/7, J=5,
symmetric extension.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N,
   "extra": {...inverse + gate results...}}

The reference publishes no absolute numbers (BASELINE.md), so
``vs_baseline`` compares against the driver-defined target instead:
90% of the single-chip HBM roofline for the minimal traffic of a fused
multi-level transform (sum_j 8B/4^j ~ 10.67 B/pixel at the nominal
819 GB/s).  vs_baseline >= 1.0 means target met.  ``extra`` also
reports the MEASURED-ACHIEVABLE roofline (the best effective copy
bandwidth ever measured on this part, BENCH_NOTES.md) — the physics
this chip can actually reach; nominal vs measured is marketing vs
wall.

DEADLINE DISCIPLINE (the harness must never die silent): the run keeps
a wall-clock budget ($BENCH_BUDGET_S, default 1380 s) enforced both
cooperatively between phases and by SIGALRM; on expiry it PRINTS the
JSON line with whatever phases completed (later phases marked skipped,
metrics_valid=false if the correctness gates never ran) and exits 0.
Every phase logs start/end + elapsed to stderr, so a truncated log
still shows where time went.  Nothing is ever TUNED in-bench: the
dispatch table ships pre-measured (libdwt_tpu/data/autotune.json,
tools/tune.py); a missing/partial bucket is only REPORTED in extra.
The reference bar: its perf protocol always produces its TSV
(/root/reference/src/libdwt.c:22559-22646).

Correctness gates (run jitted, AFTER timing — eager dispatch poisons
the process, see CLAUDE.md): the measured fused pyramid is compared
against the separable oracle ON THE DEVICE (float tolerance), an
integer fused level is compared bit-exactly, and the reconstruction
chain must round-trip the original frames — the reference-twin pattern
of /root/reference/src/libdwt.c:9501-9504 applied to the benchmark
itself, so a Mosaic miscompile cannot ship a wrong-fast number.
"""
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compiles (harmless if the backend ignores it)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


H, W = 2160, 4096  # "4K frame" (UHD-ish); J=5 needs H,W divisible by 32
LEVELS = 5
#: chained-dispatch lengths (frames per dispatch, distinct buffers).
#: Per-frame time is the SLOPE between the two lengths, which cancels
#: every fixed per-dispatch cost — host dispatch, the tunnel's
#: device->host round trip for the completion fence — the way the
#: reference's M-image working sets amortize harness overhead
#: (/root/reference/src/libdwt.c:21449).  The lengths are large enough
#: that the execution-time DIFFERENCE dwarfs the ~25-30 ms transport
#: round trip, inside which shorter chains' execution can hide
#: entirely (observed: a 0.65 ms/frame copy "measured" 0.035 ms/frame
#: at chain lengths 2/10).
CHAIN_A, CHAIN_B = 16, 64
# remote-attached dispatch jitters heavily; many cheap trials + min is
# the robust estimator
TRIALS = 20
WARMUP = 2

#: total wall-clock budget (seconds).  The driver runs bench under its
#: own timeout; ours must expire FIRST so the JSON line always prints.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1380"))
#: budget already consumed by a previous attempt of THIS run (set by the
#: init-wedge re-exec, see _bounded_init); elapsed time carries over so
#: the re-exec'd process still expires before the driver's timeout.
_CONSUMED_S = float(os.environ.get("BENCH_CONSUMED_S", "0"))
#: seconds allowed for the FIRST backend touch.  Round 4 wedged inside
#: jax.devices() at phase "start" and sat the whole 1380 s budget
#: (BENCH_r04.json); a bounded probe + one re-exec buys a fresh tunnel
#: connection instead of forfeiting the round.
INIT_TIMEOUT_S = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "240"))
_T0 = time.time()

#: best effective HBM copy bandwidth ever MEASURED on this part under
#: the chain-slope protocol (BENCH_NOTES.md: 67 MB-traffic elementwise
#: copy, 0.117 ms/frame on v5e) — the achievable ceiling; the nominal
#: spec number is not reachable by any kernel on this chip.
MEASURED_COPY_GBPS = {"v5 lite": 572.0, "v5e": 572.0}


def _elapsed() -> float:
    return time.time() - _T0 + _CONSUMED_S


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _log(msg: str) -> None:
    print(f"# [{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


#: progressively-filled result; _emit() can print it at ANY point.
RESULT = {
    "metric": "cdf97_2d_fwd_4k_j5_f32",
    "value": 0.0,
    "unit": "Mpix/s",
    "vs_baseline": 0.0,
    "extra": {"phase_reached": "start", "gates": {}},
}
_EMITTED = False


def _emit(rc: int = 0) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(RESULT), flush=True)
    sys.exit(rc)


def _deadline(signum=None, frame=None) -> None:
    RESULT["extra"]["deadline_expired"] = True
    _log(f"DEADLINE ({BUDGET_S:.0f}s) — emitting partial result")
    _emit(0)


def _watchdog() -> None:
    """Hard backstop for a transport hang: a SIGALRM handler only runs
    between Python bytecodes, and the remote tunnel has been observed
    hanging whole processes inside a blocking device fetch
    (BENCH_NOTES.md) — a daemon thread can still print the partial
    JSON and _exit."""
    end = _T0 + (BUDGET_S - _CONSUMED_S) + 10.0
    while not _EMITTED:
        left = end - time.time()
        if left <= 0:
            RESULT["extra"]["deadline_expired"] = "hard(watchdog)"
            print(json.dumps(RESULT), flush=True)
            sys.stderr.write("# watchdog: hard deadline — process hung\n")
            sys.stderr.flush()
            os._exit(0)
        time.sleep(min(left, 5.0))


def _bounded_init() -> None:
    """Bound the FIRST device touch (jax.devices() + one tiny program).

    The remote tunnel has been observed wedging whole processes inside
    backend init (BENCH_r04.json: phase "start", full budget burned).
    The probe runs in a daemon thread with a hard timeout; on the first
    wedge the process re-execs ONCE — a fresh process gets a fresh
    tunnel connection — with the consumed budget carried over in env.
    A second wedge emits the partial JSON immediately instead of
    letting the watchdog sit out the rest of the budget.  The reference
    bar: its perf protocol always produces its TSV
    (/root/reference/src/libdwt.c:22559-22646)."""
    import threading

    attempt = int(os.environ.get("BENCH_INIT_ATTEMPT", "0"))
    RESULT["extra"]["init_attempt"] = attempt
    done: dict = {}

    def probe():
        try:
            d = jax.devices()
            out = jax.jit(lambda a: a + 1.0)(
                jnp.zeros((8, 128), jnp.float32))
            done["checksum"] = float(out[0, 0])
            done["kind"] = d[0].device_kind
        except BaseException as e:  # noqa: BLE001 - recorded, not raised
            done["err"] = f"{type(e).__name__}: {str(e)[:200]}"

    th = threading.Thread(target=probe, daemon=True)
    t0 = time.time()
    th.start()
    th.join(min(INIT_TIMEOUT_S, max(30.0, _remaining() - 60.0)))
    if th.is_alive():
        RESULT["extra"]["init_wedged"] = round(time.time() - t0, 1)
        if attempt == 0:
            _log(f"backend init wedged after {time.time() - t0:.0f}s — "
                 "re-exec for a fresh tunnel connection")
            env = dict(os.environ)
            env["BENCH_INIT_ATTEMPT"] = "1"
            env["BENCH_CONSUMED_S"] = str(_elapsed())
            sys.stderr.flush()
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        _log("backend init wedged twice — emitting partial result now")
        RESULT["extra"]["error"] = "backend init wedged (two attempts)"
        _emit(0)
    if "err" in done:
        _log(f"backend init FAILED: {done['err']} — emitting")
        RESULT["extra"]["error"] = f"backend init: {done['err']}"
        _emit(0)
    _log(f"backend init ok ({done.get('kind')}, "
         f"{time.time() - t0:.1f}s, attempt {attempt})")


def _phase(name: str, min_secs: float = 60.0) -> bool:
    """Enter a phase if the budget plausibly allows it; log either way."""
    RESULT["extra"]["phase_reached"] = name
    if _remaining() < min_secs:
        _log(f"phase {name}: SKIPPED ({_remaining():.0f}s left "
             f"< {min_secs:.0f}s estimate)")
        RESULT["extra"][f"skipped_{name}"] = True
        return False
    _log(f"phase {name}: start ({_remaining():.0f}s left)")
    return True


def device_bw_gbps() -> float:
    from libdwt_tpu.autotune import _nominal_bw_gbps

    return _nominal_bw_gbps()


def measured_bw_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in MEASURED_COPY_GBPS.items():
        if key in kind:
            return bw
    return 0.7 * device_bw_gbps()  # typical effective/nominal ratio


def _fenced_time(fn, *args):
    """One trial: dispatch + fetch the checksum scalar.  Completion is
    forced by the FETCH, not by ``block_until_ready``: the remote
    transport has been observed to report readiness before the device
    finishes (a 2 GB-traffic program once "completed" in 50 us, an
    implied 41 TB/s), but a device->host literal read cannot be faked —
    the scalar's value data-depends on every output buffer."""
    t0 = time.perf_counter()
    out = fn(*args)
    float(out[0])
    return time.perf_counter() - t0


def _measure_per_frame(fn_a, args_a, fn_b, args_b, on_progress=None):
    """Per-frame seconds from the two-length slope, min-of-N per length.

    Each pass times the short and the long chain BACK-TO-BACK in this
    process (cross-process drift is up to 3x; within-process,
    back-to-back comparisons hold).  Three spaced passes let the mins
    land in a good dispatch window.  The slope cancels every fixed
    per-dispatch cost; if the window shifted between the two
    measurements and produced a nonsensical slope, fall back to the
    long chain's mean — an upper bound that still contains the fixed
    cost, i.e. conservative.

    ``on_progress(per_frame_secs)`` fires after EVERY trial pair with
    the current best estimate (slope if sane, else the long-chain upper
    bound), so a transport wedge mid-measurement still leaves a
    defensible number in the emission (VERDICT r04 weak #6).
    """
    best_a = best_b = float("inf")

    def one_pass():
        nonlocal best_a, best_b
        for _ in range(TRIALS):
            best_a = min(best_a, _fenced_time(fn_a, *args_a))
            best_b = min(best_b, _fenced_time(fn_b, *args_b))
            if on_progress is not None:
                s = (best_b - best_a) / (CHAIN_B - CHAIN_A)
                u = best_b / CHAIN_B
                on_progress(s if 0.0 < s <= u else u)

    one_pass()
    for _ in range(2):
        if _remaining() < 60.0:
            break  # keep the spaced re-passes inside the budget
        time.sleep(10)
        one_pass()

    slope = (best_b - best_a) / (CHAIN_B - CHAIN_A)
    upper = best_b / CHAIN_B
    if not (0.0 < slope <= upper):
        return upper, best_a, best_b, True
    return slope, best_a, best_b, False


def _tree_max_abs_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return jnp.max(
        jnp.stack(
            [jnp.max(jnp.abs(x - y)) for x, y in zip(leaves_a, leaves_b)]
        )
    )


def _gate_fused_vs_oracle(xs, gate_results):
    """The load-bearing core gate, runnable STANDALONE right after the
    forward measurement (it needs only the input frames): the fused 4K
    J=5 pyramid vs the separable oracle, on-device.  Running it early
    means a transport wedge later in the run (observed repeatedly this
    round) still leaves a VALIDATED headline claim in the emission."""
    from libdwt_tpu.api import wavedec2
    from libdwt_tpu.ops.fused import fused_wavedec2

    name = "fused_vs_oracle_4k"
    t0 = time.time()
    try:
        x0 = jax.jit(lambda a: a[0])(xs)
        fus = jax.jit(lambda a: fused_wavedec2(a, "cdf97", LEVELS))(x0)
        sep = jax.jit(
            lambda a: wavedec2(a, "cdf97", LEVELS, impl="separable")
        )(x0)
        d = float(jax.jit(_tree_max_abs_diff)(fus, sep))
        assert d <= 5e-4, f"fused vs oracle max|diff|={d}"
        gate_results[name] = "ok"
    except AssertionError as e:
        # the math is PROVEN wrong — fatal for the claim
        gate_results[name] = f"FAIL: {e}"
    except Exception as e:  # noqa: BLE001 - infra error: path never ran
        gate_results[name] = f"error: {type(e).__name__}: {e}"
    _log(f"gate {name} (early): {gate_results[name][:80]} "
         f"({time.time() - t0:.1f}s)")


def _gates(xs, rec, gate_results):
    """On-device reference-twin validation of the *measured* kernels.
    Each gate is one jitted program; failures are recorded (and fatal
    for the headline metric).  Gates are ORDERED most-load-bearing
    first so a deadline expiry still validates the headline path."""
    from libdwt_tpu.api import wavedec2
    from libdwt_tpu.ops.fused import fused_dwt2_level
    from libdwt_tpu.ops.separable import dwt2_level

    def gate(name, fn, min_secs=45.0):
        if name in gate_results:
            return  # already ran (the early core gate)
        if _remaining() < min_secs:
            gate_results[name] = "skipped(deadline)"
            _log(f"gate {name}: skipped(deadline)")
            return
        t0 = time.time()
        try:
            fn()
            gate_results[name] = "ok"
        except AssertionError as e:
            # a failed tolerance/exactness predicate: the math is
            # PROVEN wrong — fatal for the claim
            gate_results[name] = f"FAIL: {e}"
        except Exception as e:  # noqa: BLE001 - infra (compile service
            # HTTP 500, transport): the path never ran — recorded, but
            # it neither validates nor falsifies the math
            gate_results[name] = f"error: {type(e).__name__}: {e}"
        _log(f"gate {name}: {gate_results[name][:80]} "
             f"({time.time() - t0:.1f}s)")

    # every gate input is produced by a JITTED program: one eager
    # dispatch would poison the process (CLAUDE.md timing landmine) —
    # harmless here (timing is done) but the docstring's protocol holds
    x0 = jax.jit(lambda a: a[0])(xs)

    # 1. the timed reconstruction must round-trip the original frames
    # (cheapest, validates the whole timed fwd+inv chain)
    def g_roundtrip_4k():
        d = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec, xs))
        assert d <= 1e-3, f"4K fwd+inv round trip max|err|={d}"

    # 2. the fused Pallas 4K J=5 pyramid vs the separable oracle,
    # on-device (run explicitly: the measured path follows the tuned
    # dispatch table and may legitimately be the separable one)
    def g_fused_vs_oracle():
        from libdwt_tpu.ops.fused import fused_wavedec2

        fus = jax.jit(lambda a: fused_wavedec2(a, "cdf97", LEVELS))(x0)
        sep = jax.jit(
            lambda a: wavedec2(a, "cdf97", LEVELS, impl="separable")
        )(x0)
        d = float(jax.jit(_tree_max_abs_diff)(fus, sep))
        assert d <= 5e-4, f"fused vs oracle max|diff|={d}"

    # 2b. the streamed (manual-DMA) pyramid + reconstruction, on-device
    def g_streamed_vs_oracle():
        from libdwt_tpu.ops.streamed import (
            streamed_waverec2, streamed_wavedec2,
        )

        st = jax.jit(lambda a: streamed_wavedec2(a, "cdf97", LEVELS))(x0)
        sep = jax.jit(
            lambda a: wavedec2(a, "cdf97", LEVELS, impl="separable")
        )(x0)
        d = float(jax.jit(_tree_max_abs_diff)(st, sep))
        assert d <= 5e-4, f"streamed vs oracle max|diff|={d}"
        rec2 = jax.jit(lambda c: streamed_waverec2(c, "cdf97"))(st)
        dr = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec2, x0))
        assert dr <= 1e-3, f"streamed round trip max|err|={dr}"

    # 2c. the MXU banded-matmul pyramid + reconstruction at 4K, the
    # round-3 engineering product, validated on the machine it was
    # built for (bf16-split tolerance, BENCH_NOTES.md round-3)
    def g_mxu_vs_oracle():
        from libdwt_tpu.ops.streamed import (
            streamed_waverec2, streamed_wavedec2,
        )

        st = jax.jit(
            lambda a: streamed_wavedec2(a, "cdf97", LEVELS, body="mxu")
        )(x0)
        sep = jax.jit(
            lambda a: wavedec2(a, "cdf97", LEVELS, impl="separable")
        )(x0)
        d = float(jax.jit(_tree_max_abs_diff)(st, sep))
        assert d <= 2e-3, f"mxu vs oracle max|diff|={d}"
        rec2 = jax.jit(
            lambda c: streamed_waverec2(c, "cdf97", body="mxu")
        )(st)
        dr = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec2, x0))
        assert dr <= 2e-3, f"mxu round trip max|err|={dr}"

    # 3. integer fused level, bit-exact, at a sub-1024 size (real-TPU
    # exposure for the int Pallas path and the small-size geometry)
    def g_int_fused():
        xi = jnp.asarray(
            np.random.RandomState(1).randint(-512, 512, (512, 512), np.int32)
        )
        got = fused_dwt2_level(xi, "cdf53")
        want = jax.jit(lambda a: dwt2_level(a, "cdf53"))(xi)
        d = int(jax.jit(_tree_max_abs_diff)(got, want))
        assert d == 0, f"int fused vs oracle max|diff|={d}"

    # 4. odd-size fused geometry on the device (never hit by 'auto')
    def g_odd_fused():
        xo = jnp.asarray(
            np.random.RandomState(2).rand(513, 511).astype(np.float32)
        )
        got = fused_dwt2_level(xo, "cdf97")
        want = jax.jit(lambda a: dwt2_level(a, "cdf97"))(xo)
        d = float(jax.jit(_tree_max_abs_diff)(got, want))
        assert d <= 3e-5, f"odd-size fused vs oracle max|diff|={d}"

    # 5. BASELINE.md round-trip gates (512 simple-analogue config)
    def g_baseline_roundtrips():
        from libdwt_tpu import fdwt2, idwt2
        from libdwt_tpu.utils.testimg import EPS, test_image

        xi = jnp.asarray(test_image(256, 256, dtype=np.int32))
        ri = jax.jit(lambda a: idwt2(fdwt2(a, "cdf53", 3), "cdf53", 3))(xi)
        assert bool((ri == xi).all()), "int round trip not bit-exact"
        xf = jnp.asarray(test_image(512, 512, dtype=np.float32))
        rf = jax.jit(lambda a: idwt2(fdwt2(a, "cdf97", 1), "cdf97", 1))(xf)
        assert float(jnp.abs(rf - xf).max()) <= EPS, "float round trip out of eps"

    # 5b. COMPILED-mode exposure for the sharded fast paths: a
    # mesh-of-1 shard_map runs the streamed fwd+inv kernels with
    # boundary_rows='extended' (the 8-aligned halo contract) through
    # Mosaic on the real chip — every sharded test elsewhere is
    # interpret-only because no multi-chip hardware exists here
    # (VERDICT r04 missing #5; reference-twin precedent: BCE workers
    # validated via the PC fallback, /root/reference/src/libdwt.c:9501).
    def g_sharded_mesh1():
        from libdwt_tpu.parallel.sharded import (
            make_mesh_2d, sharded_waverec2, sharded_wavedec2,
        )

        mesh = make_mesh_2d(1, 1)
        xs1 = jnp.asarray(
            np.random.RandomState(5).rand(1024, 1024).astype(np.float32))
        got = sharded_wavedec2(xs1, "cdf97", 2, mesh=mesh,
                               kernel="streamed")
        want = jax.jit(
            lambda a: wavedec2(a, "cdf97", 2, impl="separable"))(xs1)
        d = float(jax.jit(_tree_max_abs_diff)(got, want))
        assert d <= 5e-4, f"sharded(mesh1) streamed vs oracle |diff|={d}"
        rec1 = sharded_waverec2(got, "cdf97", mesh=mesh, kernel="streamed")
        dr = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec1, xs1))
        assert dr <= 1e-3, f"sharded(mesh1) round trip |err|={dr}"
        # the fused strip kernels' extended mode, compiled, same mesh
        gotf = sharded_wavedec2(xs1, "cdf97", 2, mesh=mesh, kernel="fused")
        df = float(jax.jit(_tree_max_abs_diff)(gotf, want))
        assert df <= 5e-4, f"sharded(mesh1) fused vs oracle |diff|={df}"
        recf = sharded_waverec2(gotf, "cdf97", mesh=mesh, kernel="fused")
        drf = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(recf, xs1))
        assert drf <= 1e-3, f"sharded(mesh1) fused round trip |err|={drf}"

    # 6. the timed 3-D dispatch path vs the separable oracle (the
    # fwd3d_mvox_s metric must not ship wrong-fast)
    def g_vol_vs_oracle():
        from libdwt_tpu.api import wavedec3

        v = jnp.asarray(
            np.random.RandomState(3).rand(32, 256, 256).astype(np.float32)
        )
        got = jax.jit(lambda a: wavedec3(a, "cdf97", 2))(v)
        want = jax.jit(lambda a: wavedec3(a, "cdf97", 2, impl="separable"))(v)
        d = float(jax.jit(_tree_max_abs_diff)(got, want))
        assert d <= 5e-4, f"3-D dispatch vs oracle max|diff|={d}"

    # cheap gates first, the multi-minute Mosaic compiles (streamed /
    # MXU 4K kernels, when cold) last — a deadline then skips the
    # expensive validations instead of starving the cheap ones.  The
    # headline claim refreshes after EVERY gate so a deadline emission
    # mid-gate still carries the honest vs_baseline for what DID run.
    gate("roundtrip_4k", g_roundtrip_4k)
    _refresh_claim()
    gate("fused_vs_oracle_4k", g_fused_vs_oracle, min_secs=90.0)
    _refresh_claim()
    gate("int_fused_512", g_int_fused)
    gate("odd_fused_513x511", g_odd_fused)
    gate("baseline_roundtrips", g_baseline_roundtrips)
    gate("sharded_mesh1_compiled", g_sharded_mesh1, min_secs=180.0)
    gate("vol_vs_oracle", g_vol_vs_oracle, min_secs=60.0)
    _refresh_claim()
    gate("streamed_vs_oracle_4k", g_streamed_vs_oracle, min_secs=120.0)
    gate("mxu_vs_oracle_4k", g_mxu_vs_oracle, min_secs=150.0)
    _refresh_claim()


#: gates whose failure (as opposed to deadline-skip) zeroes the
#: headline claim: they validate the actual timed 4K paths.
_CORE_GATES = ("roundtrip_4k", "fused_vs_oracle_4k")

#: targets set by main() once the rooflines are known.
_TARGETS = {"nominal": 0.0, "measured": 0.0, "bw": 819.0}


def _refresh_claim() -> None:
    """Recompute the headline claim from whatever RESULT holds, so ANY
    emission (deadline, watchdog, exception, normal end) carries the
    honest current numbers: vs_baseline is nonzero once the forward
    number exists, at least one gate ran ok, no CORE gate failed, and
    no implied bandwidth exceeds physics (a transport whose completion
    fence fails reports impossible speed, not a fast kernel)."""
    extra = RESULT["extra"]
    gates = extra.get("gates", {})
    # 'ok' validates; 'FAIL' (a failed math predicate) falsifies;
    # 'skipped'/'error' (deadline, compile-service 500s, transport
    # wedges) neither ran the math nor disproved it
    gates_ok = (any(v == "ok" for v in gates.values())
                and not any(v.startswith("FAIL") for v in gates.values()))
    core_failed = any(
        gates.get(g, "").startswith("FAIL") for g in _CORE_GATES
    )
    suspect = max(
        extra.get("implied_bw_gbps", 0.0),
        extra.get("implied_bw_inv_gbps", 0.0),
        extra.get("implied_bw_vol_gbps", 0.0),
    ) > 1.3 * _TARGETS["bw"]
    metrics_valid = gates_ok and not core_failed and not suspect
    extra["suspect"] = suspect
    extra["metrics_valid"] = metrics_valid
    if metrics_valid and _TARGETS["nominal"]:
        RESULT["vs_baseline"] = round(
            RESULT["value"] / _TARGETS["nominal"], 4)
        extra["vs_target_measured_achievable"] = round(
            RESULT["value"] / _TARGETS["measured"], 4)
    else:
        RESULT["vs_baseline"] = 0.0
        extra["vs_target_measured_achievable"] = 0.0


def _check_tuned(h: int, w: int) -> dict:
    """REPORT (never fix) the dispatch-table state for the bench
    bucket: bench must not compile tuning candidates in-process (a
    cold candidate costs 20-60 s and the known-pathological ones hang
    Mosaic's compiler for tens of minutes, BENCH_NOTES.md).  The table
    ships pre-measured; re-tune offline with tools/tune.py."""
    from libdwt_tpu import autotune

    info = {"bucket": None, "complete": False, "warnings": []}
    b = autotune._bucket(h, w)
    info["bucket"] = b
    if b is None:
        return info
    table = autotune._load_disk().get(autotune._device_kind(), {})
    missing = []
    for suffix in ("", ":inv"):
        entry = table.get(f"{b}:float32:cdf97{suffix}")
        if entry is None or "secs" not in entry:
            missing.append(suffix or "fwd")
    info["complete"] = not missing
    if missing:
        info["warnings"].append(
            f"bucket {b} untuned for {missing}; 'auto' falls back to "
            "the nearest tuned bucket / built-in threshold")
    info["warnings"].extend(
        autotune.validate_table(table, autotune._nominal_bw_gbps()))
    for wmsg in info["warnings"]:
        _log(f"dispatch table: {wmsg}")
    return info


def main():
    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(max(1, int(BUDGET_S - _CONSUMED_S)))
    import threading

    threading.Thread(target=_watchdog, daemon=True).start()

    from libdwt_tpu.api import wavedec2, waverec2

    h = (H // (1 << LEVELS)) * (1 << LEVELS)
    w = (W // (1 << LEVELS)) * (1 << LEVELS)
    extra = RESULT["extra"]
    extra["frame"] = [h, w]
    extra["chains"] = [CHAIN_A, CHAIN_B]
    extra["budget_s"] = BUDGET_S
    # the first device touch, bounded (everything below this line may
    # talk to the backend; _check_tuned's _device_kind() was the r04
    # wedge point)
    _bounded_init()
    extra["tuned"] = _check_tuned(h, w)

    # rooflines first — they need no device work and every partial
    # emission should carry them.  Minimal HBM traffic for the level
    # pyramid: level j reads+writes h*w/4^j pixels at 4B each.
    bytes_per_pixel = sum(8.0 / 4**j for j in range(LEVELS))
    nominal_bw = device_bw_gbps()
    measured_bw = measured_bw_gbps()
    roofline_mpix_s = nominal_bw * 1e9 / bytes_per_pixel / 1e6
    roofline_measured = measured_bw * 1e9 / bytes_per_pixel / 1e6
    target = 0.9 * roofline_mpix_s
    target_measured = 0.9 * roofline_measured
    _TARGETS.update(nominal=target, measured=target_measured,
                    bw=nominal_bw)
    extra["roofline_mpix_s"] = {
        "nominal": round(roofline_mpix_s, 1),
        "measured_achievable": round(roofline_measured, 1),
        "bw_gbps": {"nominal": nominal_bw, "measured_copy": measured_bw},
        # the minimal HBM traffic of a fused level pyramid — the deep
        # streamed kernels already achieve it (one read of the frame,
        # one write of every coefficient), so the perf gap is compute,
        # not traffic (BENCH_NOTES round 4)
        "bytes_per_pixel_minimal": round(bytes_per_pixel, 3),
    }

    rng = np.random.RandomState(0)
    xs_a = jnp.asarray(rng.rand(CHAIN_A, h, w).astype(np.float32))
    xs_b = jnp.asarray(rng.rand(CHAIN_B, h, w).astype(np.float32))

    # K independent transforms per dispatch: scan compiles the body once
    # and loops on-device.  The checksum touches one element of every
    # output buffer — a cheap completion witness (see _fenced_time).
    def _checksum(tree):
        # optimization_barrier stops XLA from slice-narrowing a pure-XLA
        # path down to the elements the checksum reads (the Pallas paths
        # are opaque anyway, but 'auto' may legitimately time the
        # separable pyramid)
        leaves = jax.lax.optimization_barrier(
            tuple(jax.tree_util.tree_leaves(tree))
        )
        return sum(jnp.sum(leaf.reshape(-1)[:1]) for leaf in leaves)

    # TIMED chains reduce each frame to its checksum INSIDE the scan:
    # stacking K full-size results as program outputs costs an extra
    # copy per frame (measured +0.29 ms/frame on the inverse — a
    # harness artifact, not transform cost).  The per-frame checksum
    # still forces the whole transform: every timed path ends in Pallas
    # kernels, whose outputs are computed whole or not at all, and the
    # checksum data-depends on every kernel's output buffer.
    def fwd_chain(stack):
        def body(_, x):
            return None, _checksum(wavedec2(x, "cdf97", LEVELS))

        return jnp.sum(jax.lax.scan(body, None, stack)[1]), 0

    def inv_chain(coeffs):
        def body(_, c):
            return None, _checksum(waverec2(c, "cdf97"))

        return jnp.sum(jax.lax.scan(body, None, coeffs)[1]), 0

    # MATERIALIZING chains (untimed) produce the stacked coefficients /
    # reconstructions the correctness gates inspect.
    def fwd_mat(stack):
        def body(_, x):
            return None, wavedec2(x, "cdf97", LEVELS)

        coeffs = jax.lax.scan(body, None, stack)[1]
        return _checksum(coeffs), coeffs

    def inv_mat(coeffs):
        def body(_, c):
            return None, waverec2(c, "cdf97")

        rec = jax.lax.scan(body, None, coeffs)[1]
        return _checksum(rec), rec

    # record which impl the tuned 'auto' dispatch actually timed
    from libdwt_tpu.api import _pick_impl

    extra["auto_impl"] = {
        "fwd": _pick_impl(h, w, "cdf97", None, jnp.float32, "fwd", LEVELS),
        "inv": _pick_impl(h, w, "cdf97", None, jnp.float32, "inv", LEVELS),
    }
    _log(f"auto dispatch: {extra['auto_impl']}")

    # ---------------------------------------------- phase 1: forward
    _phase("fwd_compile", min_secs=0.0)  # never skipped: it IS the metric
    fwd = jax.jit(fwd_chain)
    for _ in range(WARMUP):
        float(fwd(xs_a)[0])
        float(fwd(xs_b)[0])
    _phase("fwd_measure", min_secs=0.0)

    def _fwd_progress(per):
        # refresh the headline after every trial pair: any later wedge
        # (watchdog emission) still ships the best number so far
        RESULT["value"] = round((h * w) / per / 1e6, 1)
        RESULT["extra"]["fwd_ms_per_frame"] = round(per * 1e3, 4)
        RESULT["extra"]["fwd_estimate"] = "incremental"

    best_fwd, raw_fa, raw_fb, fwd_fallback = _measure_per_frame(
        fwd, (xs_a,), fwd, (xs_b,), on_progress=_fwd_progress
    )
    mpix_fwd = (h * w) / best_fwd / 1e6
    extra["fwd_ms_per_frame"] = round(best_fwd * 1e3, 4)
    extra["fwd_estimate"] = "slope" if not fwd_fallback else "upper"
    extra["raw_chain_ms"] = {
        "fwd": [round(raw_fa * 1e3, 3), round(raw_fb * 1e3, 3)]}
    extra["slope_fallback"] = {"fwd": fwd_fallback}
    implied_bw = mpix_fwd * 1e6 * 8.0 / 1e9
    extra["implied_bw_gbps"] = round(implied_bw, 1)
    RESULT["value"] = round(mpix_fwd, 1)
    _log(f"fwd: {best_fwd * 1e3:.3f} ms/frame = {mpix_fwd:.0f} Mpix/s")

    # validate the headline IMMEDIATELY (one core gate, ~30 s warm):
    # the transport wedges whole processes without warning, and a wedge
    # in any later phase must not leave the forward number unvalidated
    if _phase("gate_early", min_secs=120.0):
        _gate_fused_vs_oracle(xs_b, RESULT["extra"]["gates"])
        _refresh_claim()

    # ---------------------------------------------- phase 2: inverse
    mpix_inv = 0.0
    coeffs_a = coeffs_b = None
    if _phase("inverse", min_secs=240.0):
        cs, coeffs_a = jax.jit(fwd_mat)(xs_a)
        float(cs)
        cs, coeffs_b = jax.jit(fwd_mat)(xs_b)
        float(cs)
        inv = jax.jit(inv_chain)
        for _ in range(WARMUP):
            float(inv(coeffs_a)[0])
            float(inv(coeffs_b)[0])
        best_inv, raw_ia, raw_ib, inv_fallback = _measure_per_frame(
            inv, (coeffs_a,), inv, (coeffs_b,)
        )
        mpix_inv = (h * w) / best_inv / 1e6
        extra["inverse_mpix_s"] = round(mpix_inv, 1)
        extra["inverse_vs_target"] = round(mpix_inv / target, 4)
        extra["inv_ms_per_frame"] = round(best_inv * 1e3, 4)
        extra["raw_chain_ms"]["inv"] = [
            round(raw_ia * 1e3, 3), round(raw_ib * 1e3, 3)]
        extra["slope_fallback"]["inv"] = inv_fallback
        extra["implied_bw_inv_gbps"] = round(mpix_inv * 1e6 * 8.0 / 1e9, 1)
        _log(f"inv: {best_inv * 1e3:.3f} ms/frame = {mpix_inv:.0f} Mpix/s")

    # ---------------------------------------------- phase 3: gates
    gate_results = RESULT["extra"]["gates"]
    rec_b = None
    if coeffs_b is not None and _phase("gates", min_secs=120.0):
        cs, rec_b = jax.jit(inv_mat)(coeffs_b)
        float(cs)
        _gates(xs_b, rec_b, gate_results)
    elif coeffs_b is None:
        gate_results["all"] = "skipped(deadline: no materialized coeffs)"
    _refresh_claim()

    # ------------------------------------- phase 4 (LAST): 3-D volume
    # the transport wedged this phase repeatedly this round (the big
    # host->device volume uploads); running it last means a wedge costs
    # only the 3-D metric, never the validated 2-D claim or the gates
    mvox_s = 0.0
    if _phase("volume", min_secs=240.0):
        from libdwt_tpu.api import wavedec3

        KV_A, KV_B = 4, 12
        vz, vy, vx = 64, 512, 512
        vols_a = jnp.asarray(rng.rand(KV_A, vz, vy, vx).astype(np.float32))
        vols_b = jnp.asarray(rng.rand(KV_B, vz, vy, vx).astype(np.float32))

        def vol_chain(stack):
            def body(_, v):
                return None, _checksum(wavedec3(v, "cdf97", 2))

            return jnp.sum(jax.lax.scan(body, None, stack)[1]), 0

        vfwd = jax.jit(vol_chain)
        for _ in range(WARMUP):
            float(vfwd(vols_a)[0])
            float(vfwd(vols_b)[0])
        tva = tvb = float("inf")
        for _ in range(TRIALS):
            tva = min(tva, _fenced_time(vfwd, vols_a))
            tvb = min(tvb, _fenced_time(vfwd, vols_b))
        vslope = (tvb - tva) / (KV_B - KV_A)
        if not (0.0 < vslope <= tvb / KV_B):
            vslope = tvb / KV_B
        mvox_s = (vz * vy * vx) / vslope / 1e6
        extra["fwd3d_mvox_s"] = round(mvox_s, 1)
        extra["volume"] = [vz, vy, vx]
        extra["implied_bw_vol_gbps"] = round(mvox_s * 1e6 * 8.0 / 1e9, 1)
        _log(f"vol: {mvox_s:.0f} Mvox/s")

    # the final claim refresh (see _refresh_claim for the validity
    # rules: core-gate failures and impossible implied bandwidths zero
    # the claim, deadline-skips leave it standing but recorded)
    _refresh_claim()
    core_failed = any(
        gate_results.get(g, "").startswith("FAIL") for g in _CORE_GATES
    )
    extra["phase_reached"] = "done"
    extra["total_s"] = round(_elapsed(), 1)

    _log(
        f"device={jax.devices()[0].device_kind} "
        f"fwd={best_fwd * 1e3:.3f} ms "
        f"roofline(nominal)={roofline_mpix_s:.0f} "
        f"roofline(measured)={roofline_measured:.0f} Mpix/s "
        f"target(90% nominal)={target:.0f}"
    )
    signal.alarm(0)
    _emit(0 if not core_failed else 1)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 - the JSON line must print
        # "never die silent" covers exceptions too: a Mosaic compile
        # error or transport failure still emits the partial result
        # (with the error recorded) and exits 0 — the driver then has
        # the phase reached and whatever was measured.
        import traceback

        RESULT["extra"]["error"] = f"{type(e).__name__}: {str(e)[:400]}"
        traceback.print_exc()
        _log(f"FATAL: {type(e).__name__} — emitting partial result")
        _emit(0)
