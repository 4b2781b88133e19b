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
