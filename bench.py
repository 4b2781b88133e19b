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
819 GB/s).  vs_baseline >= 1.0 means target met.

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

# HBM bandwidth per chip, GB/s (public specs).
_BW_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def device_bw_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _BW_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


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


def _measure_per_frame(fn_a, args_a, fn_b, args_b):
    """Per-frame seconds from the two-length slope, min-of-N per length.

    Each pass times the short and the long chain BACK-TO-BACK in this
    process (cross-process drift is up to 3x; within-process,
    back-to-back comparisons hold).  Three spaced passes let the mins
    land in a good dispatch window.  The slope cancels every fixed
    per-dispatch cost; if the window shifted between the two
    measurements and produced a nonsensical slope, fall back to the
    long chain's mean — an upper bound that still contains the fixed
    cost, i.e. conservative.
    """
    best_a = best_b = float("inf")

    def one_pass():
        nonlocal best_a, best_b
        for _ in range(TRIALS):
            best_a = min(best_a, _fenced_time(fn_a, *args_a))
            best_b = min(best_b, _fenced_time(fn_b, *args_b))

    one_pass()
    for _ in range(2):
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


def _gates(xs, rec, gate_results):
    """On-device reference-twin validation of the *measured* kernels.
    Each gate is one jitted program; failures are recorded (and fatal
    for the headline metric)."""
    from libdwt_tpu.api import wavedec2
    from libdwt_tpu.ops.fused import fused_dwt2_level
    from libdwt_tpu.ops.separable import dwt2_level

    def gate(name, fn):
        try:
            fn()
            gate_results[name] = "ok"
        except Exception as e:  # noqa: BLE001 - record any failure mode
            gate_results[name] = f"FAIL: {type(e).__name__}: {e}"

    # every gate input is produced by a JITTED program: one eager
    # dispatch would poison the process (CLAUDE.md timing landmine) —
    # harmless here (timing is done) but the docstring's protocol holds
    x0 = jax.jit(lambda a: a[0])(xs)

    # 1. the fused Pallas 4K J=5 pyramid vs the separable oracle,
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

    # 1b. the streamed (manual-DMA) pyramid + reconstruction, on-device
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
        rec = jax.jit(lambda c: streamed_waverec2(c, "cdf97"))(st)
        dr = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec, x0))
        assert dr <= 1e-3, f"streamed round trip max|err|={dr}"

    # 2. the timed reconstruction must round-trip the original frames
    def g_roundtrip_4k():
        d = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec, xs))
        assert d <= 1e-3, f"4K fwd+inv round trip max|err|={d}"

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

    gate("fused_vs_oracle_4k", g_fused_vs_oracle)
    gate("streamed_vs_oracle_4k", g_streamed_vs_oracle)
    gate("roundtrip_4k", g_roundtrip_4k)
    gate("int_fused_512", g_int_fused)
    gate("odd_fused_513x511", g_odd_fused)
    gate("baseline_roundtrips", g_baseline_roundtrips)
    gate("vol_vs_oracle", g_vol_vs_oracle)


def _ensure_tuned(h: int, w: int) -> bool:
    """The timed path follows the measured dispatch table; a missing or
    PARTIAL bucket entry (one whose candidate comparison never ran a
    strategy the geometry supports — e.g. a run that died between
    candidates) would make 'auto' time a known-slower kernel.  Re-tune
    the bench bucket in-process in that case: same honest chain-slope
    protocol, winner persisted for dispatch.  Returns True if a re-tune
    ran."""
    from libdwt_tpu import autotune
    from libdwt_tpu.ops.fused import fused_supported
    from libdwt_tpu.ops.streamed import streamed_supported

    b = autotune._bucket(h, w)
    if b is None:
        return False
    table = autotune._load_disk().get(autotune._device_kind(), {})
    expected = {"separable"}
    if fused_supported("cdf97"):
        expected.add("fused")
    streamed_ok = streamed_supported((h, w), "cdf97", 256, levels=2)
    if streamed_ok:
        expected.add("streamed")
    need = False
    for suffix in ("", ":inv"):
        want = set(expected)
        if suffix == "" and streamed_ok:
            # forward-only candidate (the inverse 'streamed' already
            # resolves to the MXU body for float32)
            want.add("streamed-mxu")
        entry = table.get(f"{b}:float32:cdf97{suffix}")
        if entry is None:
            need = True
            continue
        # a candidate that failed to compile on this device still counts
        # as attempted (tune_dispatch records it under 'failed') — but
        # only while the environment that failed is the CURRENT one: a
        # jax/Mosaic upgrade may have fixed the compile, so a stale
        # stamp re-tries the candidate instead of pinning dispatch to
        # the slower winner forever
        failed = entry.get("failed", {})
        if failed and entry.get("failed_jax") != jax.__version__:
            failed = {}
        tried = set(entry.get("secs", {})) | set(failed)
        if not want <= tried:
            need = True
    if need:
        print(f"# re-tuning bucket {b} (missing/partial entry)",
              file=sys.stderr)
        autotune.tune_dispatch(sizes=(b,), levels=LEVELS, trials=6)
    return need


def main():
    from libdwt_tpu.api import wavedec2, waverec2

    h = (H // (1 << LEVELS)) * (1 << LEVELS)
    w = (W // (1 << LEVELS)) * (1 << LEVELS)
    retuned = _ensure_tuned(h, w)
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

    fwd = jax.jit(fwd_chain)
    inv = jax.jit(inv_chain)

    cs, coeffs_a = jax.jit(fwd_mat)(xs_a)
    float(cs)
    cs, coeffs_b = jax.jit(fwd_mat)(xs_b)
    float(cs)
    cs, rec_b = jax.jit(inv_mat)(coeffs_b)
    float(cs)

    for _ in range(WARMUP):
        float(fwd(xs_a)[0])
        float(fwd(xs_b)[0])
    best_fwd, raw_fa, raw_fb, fwd_fallback = _measure_per_frame(
        fwd, (xs_a,), fwd, (xs_b,)
    )

    for _ in range(WARMUP):
        float(inv(coeffs_a)[0])
        float(inv(coeffs_b)[0])
    best_inv, raw_ia, raw_ib, inv_fallback = _measure_per_frame(
        inv, (coeffs_a,), inv, (coeffs_b,)
    )

    mpix_fwd = (h * w) / best_fwd / 1e6
    mpix_inv = (h * w) / best_inv / 1e6

    # 3-D volume rate (fused single-pass volume kernel), same protocol
    # at volume-sized chains.
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

    gate_results = {}
    _gates(xs_b, rec_b, gate_results)
    gates_ok = all(v == "ok" for v in gate_results.values())

    # record which impl the tuned 'auto' dispatch actually timed
    from libdwt_tpu.api import _pick_impl

    auto_impl = {
        "fwd": _pick_impl(h, w, "cdf97", None, jnp.float32, "fwd", LEVELS),
        "inv": _pick_impl(h, w, "cdf97", None, jnp.float32, "inv", LEVELS),
    }

    # Minimal HBM traffic for the level pyramid: level j reads+writes
    # h*w/4^j pixels at 4B each.
    bytes_per_pixel = sum(8.0 / 4**j for j in range(LEVELS))
    roofline_mpix_s = device_bw_gbps() * 1e9 / bytes_per_pixel / 1e6
    target = 0.9 * roofline_mpix_s

    # A failed correctness gate invalidates the speed claim.  So does a
    # physically impossible implied bandwidth (the transport has been
    # seen acknowledging work it had not finished): the fused pyramid
    # moves >= ~8 B/pixel, so implied BW far above spec means the
    # completion fence failed, not that the kernel is fast.
    implied_bw = mpix_fwd * 1e6 * 8.0 / 1e9
    implied_bw_inv = mpix_inv * 1e6 * 8.0 / 1e9
    implied_bw_vol = mvox_s * 1e6 * 8.0 / 1e9
    suspect = (
        max(implied_bw, implied_bw_inv, implied_bw_vol)
        > 1.3 * device_bw_gbps()
    )
    vs_baseline = (mpix_fwd / target) if gates_ok and not suspect else 0.0
    metrics_valid = gates_ok and not suspect

    print(
        json.dumps(
            {
                "metric": "cdf97_2d_fwd_4k_j5_f32",
                "value": round(mpix_fwd, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(vs_baseline, 4),
                "extra": {
                    "auto_impl": auto_impl,
                    "inverse_mpix_s": round(mpix_inv, 1),
                    "inverse_vs_target": round(mpix_inv / target, 4),
                    "fwd3d_mvox_s": round(mvox_s, 1),
                    "volume": [vz, vy, vx],
                    "chains": [CHAIN_A, CHAIN_B],
                    "frame": [h, w],
                    "fwd_ms_per_frame": round(best_fwd * 1e3, 4),
                    "inv_ms_per_frame": round(best_inv * 1e3, 4),
                    "raw_chain_ms": {
                        "fwd": [round(raw_fa * 1e3, 3), round(raw_fb * 1e3, 3)],
                        "inv": [round(raw_ia * 1e3, 3), round(raw_ib * 1e3, 3)],
                    },
                    "slope_fallback": {
                        "fwd": fwd_fallback, "inv": inv_fallback,
                    },
                    "implied_bw_gbps": round(implied_bw, 1),
                    "implied_bw_inv_gbps": round(implied_bw_inv, 1),
                    "implied_bw_vol_gbps": round(implied_bw_vol, 1),
                    "suspect": suspect,
                    "metrics_valid": metrics_valid,
                    "retuned": retuned,
                    "gates": gate_results,
                },
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} fwd={best_fwd*1e3:.3f} ms "
        f"inv={best_inv*1e3:.3f} ms roofline={roofline_mpix_s:.0f} Mpix/s "
        f"target(90%)={target:.0f}",
        file=sys.stderr,
    )
    if not gates_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
