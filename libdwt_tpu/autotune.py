"""Autotuner over kernel strategy and strip size, wired into dispatch.

The reference exposes a 17-variant kernel catalog, perf drivers to pick
the fastest (dwt_util_set_accel + examples/perf-plot*,
/root/reference/src/dwt.h:58-235), and leaves the choice to the user.
Here the search space is {separable XLA, fused Pallas} x strip rows,
measured ON THE LIVE DEVICE and cached two ways:

  * in-process, exact-shape cache (this module's _CACHE)
  * an on-disk table per device kind, bucketed by size
    (``~/.cache/libdwt_tpu/autotune.json`` or $LIBDWT_TPU_TUNE_FILE),
    which ``api._use_fused`` consults on every 'auto' dispatch — so
    production dispatch uses measured crossovers, not hardcoded
    thresholds, once ``tune_dispatch()`` (tools/tune.py) has run on the
    device kind.

Timings through remote-attached devices can drift between processes;
the tuner therefore only compares measurements taken back-to-back in
one process, and fences completion by fetching a checksum scalar (see
utils.perf.measure(fence=True)).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdwt_tpu.utils.perf import measure

__all__ = [
    "autotune_dwt2",
    "best_config",
    "clear_cache",
    "tune_dispatch",
    "dispatch_choice",
    "tune_file",
    "validate_table",
]

_CACHE: Dict[Tuple, Dict] = {}
_DISK: Optional[Dict] = None  # lazily loaded {device_kind: {key: entry}}

_STRIPS = (64, 96, 128, 256)
#: size buckets for the dispatch table (min-edge, power-of-two floors)
_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def clear_cache() -> None:
    global _DISK
    _CACHE.clear()
    _DISK = None


def tune_file() -> str:
    env = os.environ.get("LIBDWT_TPU_TUNE_FILE")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "libdwt_tpu", "autotune.json"
    )


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


#: nominal HBM bandwidth per chip, GB/s (public specs) — plausibility
#: ceiling for measured timings (bench.py reports rooflines from it).
_BW_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def _nominal_bw_gbps() -> float:
    kind = _device_kind().lower()
    for key, bw in _BW_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def _packaged_table() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "autotune.json")


def _load_disk() -> Dict:
    global _DISK
    if _DISK is None:
        for path in (tune_file(), _packaged_table()):
            try:
                with open(path) as f:
                    _DISK = json.load(f)
                break
            except Exception:
                continue
        else:
            _DISK = {}
    return _DISK


def _save_disk(table: Dict) -> None:
    path = tune_file()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def _bucket(h: int, w: int) -> Optional[int]:
    edge = min(h, w)
    best = None
    for b in _BUCKETS:
        if edge >= b:
            best = b
    return best


def _checksummed(tree):
    """Cheap completion witness: the first element of every leaf.

    The leaves pass through ``optimization_barrier`` first so XLA
    cannot slice-narrow a pure-XLA candidate down to the few elements
    the checksum needs (Pallas outputs are opaque anyway, but the
    separable candidate is ordinary HLO and would otherwise be
    under-measured, mis-ranking the crossover)."""
    leaves = jax.tree_util.tree_leaves(tree)
    leaves = jax.lax.optimization_barrier(tuple(leaves))
    s = sum(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)) for leaf in leaves)
    return s, tree


# ------------------------------------------------------- per-shape tuning


def autotune_dwt2(shape, wavelet="cdf97", dtype=jnp.float32, trials: int = 5):
    """Measure candidates for a single-level 2-D transform of ``shape``
    and cache the fastest.  Returns the winning config dict."""
    from libdwt_tpu.ops.fused import fused_dwt2_level, fused_supported
    from libdwt_tpu.ops.separable import dwt2_level

    key = (tuple(shape), jnp.dtype(dtype).name, str(wavelet))
    if key in _CACHE:
        return _CACHE[key]
    h, w = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w).astype(jnp.dtype(dtype)))
    results = []
    sep = jax.jit(lambda a: _checksummed(dwt2_level(a, wavelet)))
    results.append(({"impl": "separable"}, measure(sep, x, trials=trials, fence=True)))
    if min(h, w) >= 32 and fused_supported(wavelet):
        for strip in _STRIPS:
            if strip > h:
                continue
            fn = jax.jit(
                lambda a, s=strip: _checksummed(
                    fused_dwt2_level(a, wavelet, strip_rows=s)
                )
            )
            try:
                t = measure(fn, x, trials=trials, fence=True)
            except Exception:
                continue
            results.append(({"impl": "fused", "strip_rows": strip}, t))
    best = min(results, key=lambda r: r[1])
    cfg = dict(best[0], secs=best[1])
    _CACHE[key] = cfg
    return cfg


def best_config(shape, wavelet="cdf97", dtype=jnp.float32) -> Optional[Dict]:
    """Cached winner for an exact shape, or None if not tuned yet."""
    return _CACHE.get((tuple(shape), jnp.dtype(dtype).name, str(wavelet)))


# --------------------------------------------------- dispatch-level tuning


def _pyramid_candidates(wavelet, levels: int, direction: str = "fwd",
                        shape=None, dtype=jnp.float32):
    """(name, per-frame fn) candidates for a full wavedec2/waverec2
    pyramid.  ``direction='inv'`` candidates take the same frame input
    and run forward+inverse, so the candidate DIFFERENCE is the
    inverse cost (the forward part is identical, the shared fixed cost
    cancels in the comparison)."""
    from libdwt_tpu.ops.fused import (
        fused_supported, fused_wavedec2, fused_waverec2,
    )
    from libdwt_tpu.ops.separable import wavedec2 as sep_wavedec2
    from libdwt_tpu.ops.separable import waverec2 as sep_waverec2
    from libdwt_tpu.ops.streamed import (
        streamed_supported, streamed_wavedec2, streamed_waverec2,
    )

    streamed_ok = shape is not None and levels >= 2 and streamed_supported(
        shape, wavelet, 256, levels=2
    )
    if direction == "fwd":
        cands = [("separable", lambda a: sep_wavedec2(a, wavelet, levels))]
        if fused_supported(wavelet):
            cands.append(("fused", lambda a: fused_wavedec2(a, wavelet, levels)))
        if streamed_ok:
            cands.append(
                ("streamed", lambda a: streamed_wavedec2(a, wavelet, levels))
            )
            from libdwt_tpu.ops.banded import mxu_supported

            if mxu_supported(wavelet, dtype):
                cands.append((
                    "streamed-mxu",
                    lambda a: streamed_wavedec2(a, wavelet, levels,
                                                body="mxu"),
                ))
        return cands
    cands = [
        ("separable",
         lambda a: sep_waverec2(sep_wavedec2(a, wavelet, levels), wavelet))
    ]
    if fused_supported(wavelet):
        cands.append(
            ("fused",
             lambda a: fused_waverec2(sep_wavedec2(a, wavelet, levels), wavelet))
        )
    if streamed_ok:
        from libdwt_tpu.ops.banded import mxu_supported
        from libdwt_tpu.ops.streamed import poly_inv_compile_safe

        # 'streamed' is the exact VPU polyphase synthesis — only a
        # candidate where it is known to COMPILE (Mosaic OOM-kills its
        # compiler on it at 4K-class geometry, ops.streamed.
        # poly_inv_compile_safe); 'streamed-mxu' is the banded-matmul
        # synthesis (bf16-split, ~2e-4), measured separately so the
        # table records the crossover between the two bodies.
        if poly_inv_compile_safe(*shape):
            cands.append(
                ("streamed",
                 lambda a: streamed_waverec2(
                     sep_wavedec2(a, wavelet, levels), wavelet, body="poly"))
            )
        if mxu_supported(wavelet, dtype):
            cands.append(
                ("streamed-mxu",
                 lambda a: streamed_waverec2(
                     sep_wavedec2(a, wavelet, levels), wavelet, body="mxu"))
            )
    return cands


def _make_stacks(shape, dtype, ka: int, kb: int) -> Dict:
    """The two chained input stacks (built once per size and shared by
    every candidate, so all candidates measure the same data and the
    host->device transfer is paid once)."""
    rng = np.random.RandomState(0)
    return {
        k: jnp.asarray(rng.rand(k, *shape).astype(jnp.dtype(dtype)))
        for k in (ka, kb)
    }


def _chain_slope_secs(frame_fn, stacks: Dict, trials: int = 8):
    """Per-frame seconds via the two-length chain slope: each trial is
    one fenced dispatch of a scan over K stacked frames; the slope
    between the two lengths cancels the transport's fixed round-trip
    cost, inside which short-chain execution can hide entirely (see
    bench.py).  ``stacks`` maps chain length -> stacked inputs
    (:func:`_make_stacks`).

    Returns ``(secs, kind)`` with kind 'slope' (a real execution-time
    measurement) or 'upper' (the long chain's mean — the fallback when
    execution hid inside the transport's fixed cost; an upper BOUND
    containing that fixed cost, fine for same-bucket ranking but not
    comparable across sizes).  The kind is persisted with the entry so
    :func:`validate_table` knows which numbers are measurements."""
    import time

    ka, kb = sorted(stacks)

    def chain(stack):
        # checksum INSIDE the scan body: stacking K full-size results
        # as the scan's ys pays an extra copy per frame (+0.29 ms/frame
        # measured on a 4K inverse) — a harness artifact that would
        # mis-rank the candidates
        def body(_, x):
            s, _tree = _checksummed(frame_fn(x))
            return None, s

        return jnp.sum(jax.lax.scan(body, None, stack)[1])

    fn = jax.jit(chain)
    for k in (ka, kb):
        float(jax.device_get(jax.tree_util.tree_leaves(fn(stacks[k]))[0]))
    best = {ka: float("inf"), kb: float("inf")}
    for _ in range(trials):
        for k in (ka, kb):
            t0 = time.perf_counter()
            out = fn(stacks[k])
            float(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
            best[k] = min(best[k], time.perf_counter() - t0)
    slope = (best[kb] - best[ka]) / (kb - ka)
    upper = best[kb] / kb
    # a near-zero slope means the execution hid inside the fixed
    # transport cost (small sizes) — the chain average is then the
    # honest (if pessimistic) estimator for ranking
    if 0.05 * upper < slope <= upper:
        return slope, "slope"
    return upper, "upper"


#: an entry's winner must be within this factor of the runner-up; a
#: larger gap between kernels doing the same arithmetic is a timing
#: artifact (cross-process drift, a bad dispatch window), not physics.
_PLAUSIBLE_WIN_FACTOR = 8.0
#: implied bandwidth may exceed the device's nominal HBM bandwidth by
#: at most this factor before the measurement is called impossible.
_PLAUSIBLE_BW_FACTOR = 1.3
def _entry_pixels(entry, bucket: int) -> int:
    m = entry.get("measured_at", bucket)
    if isinstance(m, (list, tuple)):
        return int(m[0]) * int(m[1])
    return int(m) * int(m)


def _bytes_per_pixel(direction: str, itemsize: int = 4) -> float:
    """Minimal HBM traffic per pixel for plausibility floors: a forward
    candidate reads + writes every pixel once (2 x itemsize); an 'inv'
    entry times fwd+inv together (4 x itemsize).  Derived from the
    entry's dtype — a hardcoded 8/16 B would give float64 a 2x-too-lax
    floor and bfloat16 a 2x-too-strict one (ADVICE r04)."""
    return (2.0 if direction == "fwd" else 4.0) * itemsize


def _drop_implausible(rows: Dict, pixels: int, direction: str,
                      bw_gbps: float, kinds: Optional[Dict] = None,
                      itemsize: int = 4) -> Dict:
    """Remove physically impossible candidate timings before picking a
    winner: implied HBM traffic above the device's bandwidth, or a
    'winner' implausibly far ahead of the runner-up (both are signatures
    of a failed completion fence / polluted dispatch window, the
    contamination CLAUDE.md warns about).  Returns the surviving rows
    (never empties a single-candidate dict).

    ``kinds`` maps candidate -> estimator kind ('slope'/'upper', see
    :func:`_chain_slope_secs`).  The win-factor rule only compares
    SAME-KIND estimates: a real 'slope' measurement legitimately beats a
    transport-inflated 'upper' bound by far more than the factor at
    small buckets, and dropping it would pin a transport-bound loser as
    the winner (ADVICE r04: the shipped table's 512:inv did exactly
    that)."""
    import sys

    kinds = kinds or {}
    bytes_pp = _bytes_per_pixel(direction, itemsize)
    floor_secs = pixels * bytes_pp / (bw_gbps * _PLAUSIBLE_BW_FACTOR * 1e9)
    rows = dict(rows)
    for name in [n for n, s in rows.items() if s < floor_secs]:
        if len(rows) == 1:
            break
        print(f"tune: dropping {name}={rows[name]:.3g}s (implies "
              f"> {_PLAUSIBLE_BW_FACTOR:g}x device bandwidth)",
              file=sys.stderr)
        del rows[name]
    while len(rows) >= 2:
        order = sorted(rows, key=rows.get)
        best, second = rows[order[0]], rows[order[1]]
        if best * _PLAUSIBLE_WIN_FACTOR >= second:
            break
        if (kinds.get(order[0], "slope")
                != kinds.get(order[1], "slope")):
            # slope-vs-upper gaps are expected, not artifacts
            break
        print(f"tune: dropping {order[0]}={best:.3g}s "
              f"({second / best:.0f}x ahead of the runner-up — timing "
              "artifact)", file=sys.stderr)
        del rows[order[0]]
    return rows


def validate_table(mine: Dict, bw_gbps: float = 819.0) -> list:
    """Consistency findings for one device kind's dispatch table (empty
    list = plausible).  Flags (a) entries whose winner implies more than
    ~device bandwidth, (b) winners implausibly far ahead of their
    runner-up, (c) a candidate whose SLOPE-measured absolute per-frame
    time DECREASES as the frame grows between adjacent buckets (more
    pixels cannot take less time) — all signatures of measurements
    taken in different dispatch windows (the cross-process drift
    CLAUDE.md documents) that would pin wrong dispatch winners.

    'upper'-kind estimates (entry['estimator']; the transport-floor
    bound _chain_slope_secs falls back to when execution hides inside
    the fixed dispatch cost) are bounds, not measurements: they rank
    candidates within their own bucket but are exempt from the
    cross-bucket check.  Entries with no estimator map (legacy tables)
    are treated as slope-measured."""
    findings = []
    families: Dict[Tuple, Dict[int, Tuple[Dict, Dict]]] = {}
    for key, entry in mine.items():
        parts = key.split(":")
        if not parts[0].isdigit() or "secs" not in entry:
            continue
        bucket = int(parts[0])
        fam = tuple(parts[1:])
        rows = entry["secs"]
        kinds = entry.get("estimator", {})
        winner = min(rows, key=rows.get)
        best = rows[winner]
        pixels = _entry_pixels(entry, bucket)
        try:
            itemsize = jnp.dtype(parts[1]).itemsize if len(parts) > 1 else 4
        except TypeError:
            itemsize = 4
        bytes_pp = _bytes_per_pixel(
            "fwd" if "inv" not in parts else "inv", itemsize)
        implied = pixels * bytes_pp / best / 1e9
        if implied > bw_gbps * _PLAUSIBLE_BW_FACTOR:
            findings.append(
                f"{key}: winner {winner}={best:.3g}s implies "
                f"{implied:.0f} GB/s (> {_PLAUSIBLE_BW_FACTOR:g}x device "
                f"bandwidth {bw_gbps:.0f})")
        if len(rows) >= 2:
            order = sorted(rows, key=rows.get)
            second = rows[order[1]]
            same_kind = (kinds.get(order[0], "slope")
                         == kinds.get(order[1], "slope"))
            if best * _PLAUSIBLE_WIN_FACTOR < second and same_kind:
                findings.append(
                    f"{key}: winner {winner}={best:.3g}s is "
                    f"{second / best:.0f}x ahead of the runner-up "
                    f"({second:.3g}s) — timing artifact")
        families.setdefault(fam, {})[bucket] = (rows, kinds)
    for fam, by_bucket in families.items():
        buckets = sorted(by_bucket)
        for b1, b2 in zip(buckets, buckets[1:]):
            rows1, kinds1 = by_bucket[b1]
            rows2, kinds2 = by_bucket[b2]
            for cand in set(rows1) & set(rows2):
                if (kinds1.get(cand, "slope") != "slope"
                        or kinds2.get(cand, "slope") != "slope"):
                    continue
                s1, s2 = rows1[cand], rows2[cand]
                if s1 > s2 * 1.2:
                    findings.append(
                        f"{':'.join(fam)}: {cand} takes {s1:.3g}s at "
                        f"bucket {b1} but only {s2:.3g}s at the LARGER "
                        f"bucket {b2} — measured in different dispatch "
                        "windows?")
    return findings


def tune_dispatch(
    sizes=(256, 512, 1024, 2048),
    wavelet="cdf97",
    dtype=jnp.float32,
    levels: int = 3,
    trials: int = 8,
    save: bool = True,
) -> Dict:
    """Measure the full-pyramid separable-vs-fused crossover at each
    size bucket on the live device and persist the winners; 'auto'
    dispatch then uses the measured table (the perf-driver-informed
    accel selection of /root/reference/src/libdwt.h:1703-1726).

    ``sizes`` entries are square edges (int) or explicit ``(h, w)``
    shapes — the bench tunes its bucket at the real 4K frame geometry.
    Implausible candidate timings are dropped before the winner is
    picked (:func:`_drop_implausible`) and the finished table is
    checked with :func:`validate_table` (findings go to stderr)."""
    import sys

    kind = _device_kind()
    wname = get_name(wavelet)
    table = dict(_load_disk())
    mine = dict(table.get(kind, {}))
    bw = _nominal_bw_gbps()
    for n in sizes:
        shape = (tuple(int(s) for s in n) if isinstance(n, (tuple, list))
                 else (int(n), int(n)))
        # key by the dispatch-time bucket (a size between buckets would
        # otherwise write an entry dispatch_choice can never read)
        b = _bucket(*shape)
        if b is None:
            print(f"tune: size {n} below the smallest bucket; skipped",
                  file=sys.stderr)
            continue
        stacks = _make_stacks(shape, dtype, 8, 32)
        pixels = shape[0] * shape[1]
        for direction in ("fwd", "inv"):
            rows = {}
            kinds = {}
            failed = {}
            for name, frame_fn in _pyramid_candidates(
                wavelet, levels, direction, shape=shape, dtype=dtype
            ):
                try:
                    rows[name], kinds[name] = _chain_slope_secs(
                        frame_fn, stacks, trials=trials
                    )
                except Exception as e:  # pragma: no cover - device-dependent
                    # record the failure IN the entry: a candidate that
                    # cannot compile on this device (e.g. a Mosaic
                    # internal error) must still count as "attempted",
                    # else completeness checks re-tune on every run
                    failed[name] = f"{type(e).__name__}: {str(e)[:120]}"
                    print(
                        f"tune: {n}:{direction}:{name} failed: "
                        f"{failed[name]}",
                        file=sys.stderr,
                    )
                    continue
                print(f"tune: {n}:{direction}:{name} = "
                      f"{rows[name]:.3e} s/frame ({kinds[name]})",
                      file=sys.stderr)
            suffix = "" if direction == "fwd" else ":inv"
            if not rows:
                if failed:
                    # every candidate failed: persist the failure map so
                    # completeness checks still see the attempt instead
                    # of re-tuning on every run (consumers tolerate a
                    # missing 'impl')
                    mine[f"{b}:{jnp.dtype(dtype).name}:{wname}{suffix}"] = {
                        "failed": failed,
                        "failed_jax": jax.__version__,
                        "measured_at": list(shape),
                    }
                continue
            kept = _drop_implausible(
                rows, pixels, direction, bw, kinds=kinds,
                itemsize=jnp.dtype(dtype).itemsize)
            winner = min(kept, key=kept.get)
            entry = {
                "impl": winner,
                "secs": kept,
                "estimator": {k: kinds[k] for k in kept},
                "measured_at": (shape[0] if shape[0] == shape[1]
                                else list(shape)),
            }
            dropped = {k: v for k, v in rows.items() if k not in kept}
            if dropped:
                # evidence of the artifact is preserved, but OUT of the
                # ranking data validate_table examines
                entry["dropped"] = dropped
            if failed:
                entry["failed"] = failed
                # a compile failure is environment-specific: stamp it so
                # a jax/Mosaic upgrade invalidates the "attempted" claim
                # and the candidate is re-tried
                entry["failed_jax"] = jax.__version__
            mine[f"{b}:{jnp.dtype(dtype).name}:{wname}{suffix}"] = entry
    for finding in validate_table(mine, bw):
        print(f"tune: TABLE WARNING: {finding}", file=sys.stderr)
    table[kind] = mine
    if save:
        _save_disk(table)
    global _DISK
    _DISK = table
    return mine


def _volume_candidates(wavelet, shape3, direction: str = "fwd",
                       itemsize: int = 4):
    """(name, per-volume fn) candidates for a single-level 3-D
    transform; 'inv' runs forward+inverse (shared forward cancels)."""
    from libdwt_tpu.ops.fused3d import fused_dwt3_level, fused_idwt3_level
    from libdwt_tpu.ops.separable import dwt3_level, idwt3_level
    from libdwt_tpu.ops.streamed3d import (
        streamed3d_supported, streamed_dwt3_level, streamed_idwt3_level,
    )

    streamed_ok = streamed3d_supported(shape3, wavelet, itemsize=itemsize)
    if direction == "fwd":
        cands = [("separable", lambda v: dwt3_level(v, wavelet)),
                 ("fused", lambda v: fused_dwt3_level(v, wavelet))]
        if streamed_ok:
            cands.append(("streamed", lambda v: streamed_dwt3_level(v, wavelet)))
        return cands
    cands = [
        ("separable", lambda v: idwt3_level(dwt3_level(v, wavelet), wavelet)),
        ("fused", lambda v: fused_idwt3_level(dwt3_level(v, wavelet), wavelet)),
    ]
    if streamed_ok:
        cands.append(
            ("streamed",
             lambda v: streamed_idwt3_level(dwt3_level(v, wavelet), wavelet))
        )
    return cands


def tune_dispatch3(
    shape3=(64, 512, 512),
    wavelet="cdf97",
    dtype=jnp.float32,
    trials: int = 8,
    save: bool = True,
    probe_timeout_s: float = 600.0,
) -> Dict:
    """Measure the 3-D single-level crossover (separable vs fused vs
    streamed) on the live device; persisted under a 'vol:' key and
    consulted by api._pick_impl3's 'auto'.

    Kernel winners additionally face a bounded SUBPROCESS compile probe
    (:func:`probe_volume_compile`): a candidate whose fresh-process
    compile wedges past ``probe_timeout_s`` is recorded in the entry's
    'probe' map and demoted at dispatch time (:func:`_entry_impl`) —
    measuring fast in THIS process proves nothing about the
    nondeterministic Mosaic wedge observed in round 4.  Set
    ``probe_timeout_s=0`` to skip probing."""
    kind = _device_kind()
    wname = get_name(wavelet)
    table = dict(_load_disk())
    mine = dict(table.get(kind, {}))
    stacks = _make_stacks(shape3, dtype, 2, 6)
    itemsize = jnp.dtype(dtype).itemsize
    for direction in ("fwd", "inv"):
        rows = {}
        kinds = {}
        for name, vol_fn in _volume_candidates(
            wavelet, shape3, direction, itemsize=itemsize
        ):
            try:
                rows[name], kinds[name] = _chain_slope_secs(
                    vol_fn, stacks, trials=trials)
            except Exception as e:  # pragma: no cover - device-dependent
                import sys

                print(f"tune3: {direction}:{name} failed: "
                      f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
                continue
            import sys

            print(f"tune3: {direction}:{name} = {rows[name]:.3e} "
                  f"s/volume ({kinds[name]})", file=sys.stderr)
        if not rows:
            continue
        winner = min(rows, key=rows.get)
        suffix = "" if direction == "fwd" else ":inv"
        mine[f"vol:{jnp.dtype(dtype).name}:{wname}{suffix}"] = {
            "impl": winner,
            "secs": rows,
            "estimator": kinds,
        }
    if probe_timeout_s > 0:
        # bounded cold-process compile probe per kernel candidate; the
        # verdict applies to BOTH directions' entries (the kernels
        # share bodies, and measuring fast in THIS process proves
        # nothing about the nondeterministic fresh-process wedge)
        probe = {}
        for cand in ("fused", "streamed"):
            probe[cand] = probe_volume_compile(
                shape3, wavelet, dtype, impl=cand,
                timeout_s=probe_timeout_s)
            import sys

            print(f"tune3: compile probe {cand}: {probe[cand]}",
                  file=sys.stderr)
        for suffix in ("", ":inv"):
            entry = mine.get(f"vol:{jnp.dtype(dtype).name}:{wname}{suffix}")
            if entry is not None:
                entry["probe"] = {
                    k: v for k, v in probe.items() if k in entry["secs"]}
    table[kind] = mine
    if save:
        _save_disk(table)
    global _DISK
    _DISK = table
    return mine


def _impl_lookup(mine: Dict, base: str, direction: str) -> Optional[str]:
    """Table lookup with the ':inv' direction split (falling back to
    the forward entry for tables written before the split)."""
    entry = None
    if direction == "inv":
        entry = mine.get(base + ":inv")
    if entry is None:
        entry = mine.get(base)
    if entry is None:
        return None
    return _entry_impl(entry)


def _entry_impl(entry: Dict) -> Optional[str]:
    """An entry's dispatch winner, demoted past candidates whose
    compile PROBE failed.  ``entry['probe']`` maps impl -> 'ok' |
    'timeout' | 'error: ...' (written by :func:`probe_volume_compile`
    via tools/tune.py): a winner whose bounded subprocess compile
    wedged or died must not be dispatched to — the round-4 streamed
    3-D kernel sometimes hangs Mosaic 30-50 min nondeterministically —
    so the fastest candidate whose probe is ok (or was never probed)
    wins instead."""
    impl = entry.get("impl")
    probe = entry.get("probe")
    if not probe or probe.get(impl, "ok") == "ok":
        return impl
    secs = entry.get("secs", {})
    ranked = sorted(secs, key=secs.get)
    for cand in ranked:
        if probe.get(cand, "ok") == "ok":
            return cand
    return impl


def volume_choice(dtype, wavelet, direction: str = "fwd") -> Optional[str]:
    """Measured 3-D 'auto' choice for the device kind, or None.
    Respects compile-probe verdicts (see :func:`_entry_impl`)."""
    disk = _load_disk()
    mine = disk.get(_device_kind())
    if not mine:
        return None
    return _impl_lookup(
        mine, f"vol:{jnp.dtype(dtype).name}:{get_name(wavelet)}", direction
    )


#: snippet run in the probe subprocess: compile + run ONE volume level
#: through the named kernel and fetch a checksum (the completion fence
#: of utils/perf.py).
_PROBE_SNIPPET = """
import sys
import numpy as np
import jax, jax.numpy as jnp
shape = ({z}, {y}, {x})
impl = {impl!r}
if impl == "streamed":
    from libdwt_tpu.ops.streamed3d import streamed_dwt3_level as fn
else:
    from libdwt_tpu.ops.fused3d import fused_dwt3_level as fn
v = jnp.asarray(np.random.RandomState(0).rand(*shape).astype({dtype!r}))
# Mosaic compile is the probe target; off-TPU (plumbing tests) runs
# the interpreter instead
out = fn(v, {wavelet!r}, interpret=jax.devices()[0].platform != "tpu")
print("PROBE_OK", float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
"""


def probe_volume_compile(
    shape3=(64, 512, 512),
    wavelet="cdf97",
    dtype=jnp.float32,
    impl: str = "streamed",
    timeout_s: float = 600.0,
) -> str:
    """Compile-wall probe: compile + run the 3-D kernel ONCE in a fresh
    SUBPROCESS with a hard timeout, so a nondeterministic Mosaic wedge
    (30-50 min, no error — observed three times in round 4 on the
    streamed volume kernel) costs ``timeout_s``, not the tune run.
    Returns 'ok', 'timeout' or 'error: ...'.  The reference twin: its
    10-approach volume dispatch assumes every approach runs
    (/root/reference/src/volume-dwt.h:195-210); on this toolchain that
    assumption needs enforcement."""
    import subprocess
    import sys

    z, y, x = shape3
    code = _PROBE_SNIPPET.format(
        z=z, y=y, x=x, impl=impl, dtype=jnp.dtype(dtype).name,
        wavelet=get_name(wavelet))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=root, env=env,
        )
    except subprocess.TimeoutExpired:
        return "timeout"
    if res.returncode == 0 and "PROBE_OK" in res.stdout:
        return "ok"
    tail = (res.stderr or res.stdout).strip().splitlines()
    return f"error: rc={res.returncode} {tail[-1][:160] if tail else ''}"


def dispatch_choice(
    h: int, w: int, dtype, wavelet, direction: str = "fwd"
) -> Optional[str]:
    """Measured 'auto' dispatch choice for a shape, or None when the
    device kind has not been tuned (caller falls back to its built-in
    heuristic).  ``direction='inv'`` consults the inverse crossover
    table.  A shape whose own bucket is untuned uses the largest tuned
    bucket below it (the best measured predictor available)."""
    disk = _load_disk()
    mine = disk.get(_device_kind())
    if not mine:
        return None
    b = _bucket(h, w)
    if b is None:
        return None
    name = get_name(wavelet)
    dt = jnp.dtype(dtype).name
    for bb in [x for x in reversed(_BUCKETS) if x <= b]:
        impl = _impl_lookup(mine, f"{bb}:{dt}:{name}", direction)
        if impl is not None:
            return impl
    return None


def get_name(wavelet) -> str:
    from libdwt_tpu.models.wavelets import get_wavelet

    return get_wavelet(wavelet).name
