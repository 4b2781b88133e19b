"""Autotune dispatch table: measured winners drive api._use_fused."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import autotune
from libdwt_tpu.api import _use_fused


@pytest.fixture
def tuned(tmp_path, monkeypatch):
    path = tmp_path / "autotune.json"
    monkeypatch.setenv("LIBDWT_TPU_TUNE_FILE", str(path))
    autotune.clear_cache()
    yield path
    autotune.clear_cache()


def _write(path, kind, entries):
    path.write_text(json.dumps({kind: entries}))


def test_dispatch_choice_consults_disk(tuned, monkeypatch):
    kind = autotune._device_kind()
    _write(tuned, kind, {
        "512:float32:cdf97": {"impl": "fused", "secs": {}},
        "1024:float32:cdf97": {"impl": "separable", "secs": {}},
    })
    assert autotune.dispatch_choice(512, 640, jnp.float32, "cdf97") == "fused"
    assert autotune.dispatch_choice(1024, 4096, jnp.float32, "cdf97") == "separable"
    # untuned bucket / tiny size -> None (heuristic fallback)
    assert autotune.dispatch_choice(64, 64, jnp.float32, "cdf97") is None
    assert autotune.dispatch_choice(512, 512, jnp.int32, "cdf97") is None


def test_use_fused_obeys_measured_table(tuned, monkeypatch):
    kind = autotune._device_kind()
    _write(tuned, kind, {
        "512:float32:cdf97": {"impl": "fused", "secs": {}},
        "2048:float32:cdf97": {"impl": "separable", "secs": {}},
    })
    monkeypatch.setattr("libdwt_tpu.api._on_tpu", lambda: True)
    # tuned buckets override the _AUTO_MIN_SIZE=1024 threshold both ways
    assert _use_fused(512, 512, "cdf97", None, jnp.float32) is True
    assert _use_fused(2048, 2048, "cdf97", None, jnp.float32) is False
    # untuned bucket falls back to the heuristic
    assert _use_fused(1024, 1024, "cdf97", None, jnp.float32) is True
    # explicit impl always wins
    assert _use_fused(2048, 2048, "cdf97", "fused", jnp.float32) is True
    assert _use_fused(512, 512, "cdf97", "separable", jnp.float32) is False


def test_autotune_dwt2_measures_and_caches(tuned):
    cfg = autotune.autotune_dwt2((64, 64), "cdf97", trials=1)
    assert cfg["impl"] in ("separable", "fused")
    assert autotune.best_config((64, 64), "cdf97") == cfg


def test_tune_dispatch_records_failed_candidates(tuned, monkeypatch):
    """A candidate that cannot compile on the device must land in the
    entry's 'failed' map (counting as attempted), or completeness
    checks like bench._ensure_tuned re-tune on every run."""

    def fake_candidates(wavelet, levels, direction, shape=None, dtype=None):
        from libdwt_tpu.ops.separable import wavedec2 as sep

        def boom(a):
            raise RuntimeError("MosaicError: INTERNAL: remote_compile")

        return [
            ("separable", lambda a: sep(a, wavelet, levels)),
            ("streamed", boom),
        ]

    monkeypatch.setattr(autotune, "_pyramid_candidates", fake_candidates)
    mine = autotune.tune_dispatch(sizes=(128,), levels=2, trials=1)
    entry = mine["128:float32:cdf97"]
    assert entry["impl"] == "separable"
    assert "streamed" in entry.get("failed", {})
    assert "MosaicError" in entry["failed"]["streamed"]
    # the attempted set (secs + failed) covers both candidates
    tried = set(entry["secs"]) | set(entry["failed"])
    assert {"separable", "streamed"} <= tried


def test_validate_table_flags_contamination():
    """The round-3 packaged table shipped physically inconsistent
    entries (a 512 'winner' 17x ahead of the runner-up, adjacent
    buckets disagreeing 20x on per-pixel time — VERDICT.md round 3);
    validate_table must flag exactly those signatures."""
    mine = {
        # winner implausibly far ahead of the runner-up
        "512:float32:cdf97": {
            "impl": "streamed", "measured_at": 512,
            "secs": {"streamed": 5.47e-05, "separable": 1.08e-3,
                     "fused": 9.95e-4},
        },
        # adjacent buckets disagreeing >3x per-pixel
        "1024:float32:cdf97": {
            "impl": "fused", "measured_at": 1024,
            "secs": {"fused": 8.09e-4, "separable": 8.33e-4},
        },
        "2048:float32:cdf97": {
            "impl": "fused", "measured_at": 2048,
            "secs": {"fused": 1.60e-4, "separable": 1.91e-4},
        },
    }
    findings = autotune.validate_table(mine, bw_gbps=819.0)
    assert any("512:float32:cdf97" in f and "ahead of the runner-up" in f
               for f in findings)
    assert any("1024" in f and "2048" in f for f in findings)


def test_validate_table_flags_impossible_bandwidth():
    # 4096^2 pixels * 8 B in 10 us -> 13.4 TB/s, impossible on any TPU
    mine = {"4096:float32:cdf97": {
        "impl": "fused", "measured_at": 4096,
        "secs": {"fused": 1e-5, "separable": 2e-5},
    }}
    findings = autotune.validate_table(mine, bw_gbps=819.0)
    assert any("bandwidth" in f for f in findings)


def test_validate_table_accepts_consistent_entries():
    mine = {
        "1024:float32:cdf97": {
            "impl": "fused", "measured_at": 1024,
            "secs": {"fused": 5.0e-5, "separable": 7.0e-5},
        },
        "2048:float32:cdf97": {
            "impl": "fused", "measured_at": 2048,
            "secs": {"fused": 1.6e-4, "separable": 1.9e-4},
        },
        # rectangular measured_at (the bench 4K geometry in the 2048
        # bucket) participates via its true pixel count -- keyed by a
        # distinct dtype so it does not collide with the square entry
        "2048:bfloat16:cdf97": {
            "impl": "fused", "measured_at": [2144, 4096],
            "secs": {"fused": 3.4e-4, "separable": 4.2e-4},
        },
        # failed-only entries and volume keys are ignored
        "512:float32:cdf97": {"failed": {"streamed": "MosaicError"},
                              "failed_jax": "0.9"},
        "vol:float32:cdf97": {"impl": "fused", "secs": {"fused": 1e-3}},
    }
    assert autotune.validate_table(mine, bw_gbps=819.0) == []


def test_drop_implausible_removes_timing_artifacts():
    rows = {"streamed": 5.47e-05, "separable": 1.08e-3, "fused": 9.95e-4}
    kept = autotune._drop_implausible(rows, 512 * 512, "fwd", 819.0)
    assert "streamed" not in kept
    assert min(kept, key=kept.get) == "fused"
    # plausible spreads survive untouched
    rows2 = {"fused": 1.6e-4, "separable": 1.9e-4}
    assert autotune._drop_implausible(rows2, 2048 * 2048, "fwd", 819.0) == rows2
    # a single candidate is never dropped, however fast it claims to be
    rows3 = {"separable": 1e-9}
    assert autotune._drop_implausible(rows3, 2048 * 2048, "fwd", 819.0) == rows3


def test_packaged_table_is_consistent():
    """The table that SHIPS must pass its own plausibility validation
    (the round-3 table did not: VERDICT.md 'What's weak' #2)."""
    import os

    path = autotune._packaged_table()
    assert os.path.exists(path)
    with open(path) as f:
        table = json.load(f)
    for kind, mine in table.items():
        findings = autotune.validate_table(mine)
        assert findings == [], f"{kind}: {findings}"


def test_inverse_candidates_split_poly_and_mxu():
    """The inverse candidate list must (a) omit the polyphase streamed
    body at geometries where it cannot compile (Mosaic OOM, 4K-class)
    and (b) offer the MXU synthesis as its own named candidate so the
    table records the poly/mxu crossover (VERDICT r3 weak #6)."""
    small = [n for n, _ in autotune._pyramid_candidates(
        "cdf97", 5, "inv", shape=(1024, 1024), dtype=jnp.float32)]
    assert "streamed" in small and "streamed-mxu" in small
    big = [n for n, _ in autotune._pyramid_candidates(
        "cdf97", 5, "inv", shape=(2144, 4096), dtype=jnp.float32)]
    assert "streamed" not in big  # polyphase inverse cannot compile at 4K
    assert "streamed-mxu" in big
    # integers: no MXU candidate (bit-exactness needs the polyphase body)
    ints = [n for n, _ in autotune._pyramid_candidates(
        "cdf53", 5, "inv", shape=(1024, 1024), dtype=jnp.int32)]
    assert "streamed-mxu" not in ints


def test_drop_implausible_keeps_slope_winner_vs_upper_bounds():
    """ADVICE r04: a real 'slope' measurement competing against
    transport-inflated 'upper' bounds legitimately wins by >8x at small
    buckets; the win-factor rule must only compare same-kind estimates
    (the shipped table's 512:inv once dropped its true fused winner)."""
    from libdwt_tpu.autotune import _drop_implausible

    rows = {"fused": 4.7e-5, "separable": 7.8e-4, "streamed": 8.1e-4}
    kinds = {"fused": "slope", "separable": "upper", "streamed": "upper"}
    kept = _drop_implausible(rows, 512 * 512, "inv", 819.0, kinds=kinds)
    assert "fused" in kept and min(kept, key=kept.get) == "fused"

    # same-kind gaps beyond the factor are still artifacts
    kinds_same = {k: "slope" for k in rows}
    kept2 = _drop_implausible(rows, 512 * 512, "inv", 819.0,
                              kinds=kinds_same)
    assert "fused" not in kept2


def test_bytes_per_pixel_tracks_dtype():
    """ADVICE r04: plausibility floors derive from the entry's dtype
    (2 x itemsize fwd, 4 x itemsize inv), not hardcoded float32."""
    from libdwt_tpu.autotune import _bytes_per_pixel

    assert _bytes_per_pixel("fwd", 4) == 8.0
    assert _bytes_per_pixel("inv", 4) == 16.0
    assert _bytes_per_pixel("fwd", 8) == 16.0
    assert _bytes_per_pixel("inv", 2) == 8.0


def test_entry_impl_demotes_probe_failed_winner():
    """VERDICT r04 #4: a dispatch winner whose bounded subprocess
    compile probe wedged must be demoted to the fastest candidate with
    a clean (or absent) probe verdict; a clean probe keeps the
    winner."""
    from libdwt_tpu.autotune import _entry_impl

    entry = {
        "impl": "streamed",
        "secs": {"streamed": 1.1e-3, "fused": 1.5e-3, "separable": 1.7e-3},
        "probe": {"streamed": "timeout", "fused": "ok"},
    }
    assert _entry_impl(entry) == "fused"
    entry["probe"]["streamed"] = "ok"
    assert _entry_impl(entry) == "streamed"
    # no probe data at all: trust the measurement (legacy tables)
    assert _entry_impl({"impl": "streamed", "secs": {}}) == "streamed"
    # every kernel failed: fall through to the unprobed separable
    entry2 = {
        "impl": "streamed",
        "secs": {"streamed": 1.1e-3, "fused": 1.5e-3, "separable": 1.7e-3},
        "probe": {"streamed": "timeout", "fused": "error: rc=1"},
    }
    assert _entry_impl(entry2) == "separable"


def test_volume_choice_respects_shipped_probe(monkeypatch, tmp_path):
    """The shipped v5e table records round 4's observed streamed-kernel
    compile wedges; 'auto' must dispatch the fused volume kernel until
    a clean probe run flips the verdict."""
    import jax.numpy as jnp
    from libdwt_tpu import autotune

    monkeypatch.setattr(autotune, "_device_kind", lambda: "TPU v5 lite")
    monkeypatch.delenv("LIBDWT_TPU_TUNE_FILE", raising=False)
    autotune.clear_cache()
    try:
        assert autotune.volume_choice(jnp.float32, "cdf97", "fwd") == "fused"
    finally:
        autotune.clear_cache()


def test_probe_volume_compile_subprocess_bounded(monkeypatch):
    """The probe is a real subprocess with a hard timeout: a wedged
    compile costs timeout_s and returns 'timeout', never hangs the
    tune."""
    from libdwt_tpu import autotune

    # a snippet that sleeps forever stands in for a wedged Mosaic
    # compile; the CPU-backend real path is exercised separately below
    monkeypatch.setattr(autotune, "_PROBE_SNIPPET",
                        "import time\ntime.sleep(3600)\n# {z}{y}{x}"
                        "{impl}{dtype}{wavelet}")
    out = autotune.probe_volume_compile(
        (8, 32, 32), "cdf97", impl="streamed", timeout_s=2.0)
    assert out == "timeout"

    monkeypatch.setattr(autotune, "_PROBE_SNIPPET",
                        "print('PROBE_OK', {z}, {y}, {x}, "
                        "{impl!r}, {dtype!r}, {wavelet!r})")
    out = autotune.probe_volume_compile(
        (8, 32, 32), "cdf97", impl="streamed", timeout_s=30.0)
    assert out == "ok"

    monkeypatch.setattr(autotune, "_PROBE_SNIPPET",
                        "raise SystemExit('boom {z}{y}{x}"
                        "{impl}{dtype}{wavelet}')")
    out = autotune.probe_volume_compile(
        (8, 32, 32), "cdf97", impl="streamed", timeout_s=30.0)
    assert out.startswith("error")
