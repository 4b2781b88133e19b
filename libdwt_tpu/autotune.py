"""Autotuner over kernel strategy and strip size.

The reference exposes a 17-variant kernel catalog and perf drivers to
pick the fastest (dwt_util_set_accel + examples/perf-plot*,
/root/reference/src/dwt.h:58-235).  Here the search space is small by
design — {separable, fused, 2-level fused} x strip rows — and this
module measures the candidates on the live device and caches the
winner per (shape, dtype, wavelet) key.

Timings through remote-attached devices can drift between processes;
the tuner therefore only compares measurements taken back-to-back in
one process.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdwt_tpu.ops.fused import fused_dwt2_level
from libdwt_tpu.ops.separable import dwt2_level
from libdwt_tpu.utils.perf import measure

__all__ = ["autotune_dwt2", "best_config", "clear_cache"]

_CACHE: Dict[Tuple, Dict] = {}

_STRIPS = (64, 128, 256)


def clear_cache() -> None:
    _CACHE.clear()


def _key(shape, dtype, wavelet):
    return (tuple(shape), jnp.dtype(dtype).name, str(wavelet))


def autotune_dwt2(shape, wavelet="cdf97", dtype=jnp.float32, trials: int = 5):
    """Measure candidates for a single-level 2-D transform of ``shape``
    and cache the fastest.  Returns the winning config dict."""
    key = _key(shape, dtype, wavelet)
    if key in _CACHE:
        return _CACHE[key]
    h, w = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w).astype(jnp.dtype(dtype)))
    results = []
    sep = jax.jit(lambda a: dwt2_level(a, wavelet))
    results.append(({"impl": "separable"}, measure(sep, x, trials=trials)))
    if min(h, w) >= 32:
        for strip in _STRIPS:
            if strip > h:
                continue
            fn = jax.jit(
                lambda a, s=strip: fused_dwt2_level(a, wavelet, strip_rows=s)
            )
            try:
                t = measure(fn, x, trials=trials)
            except Exception:
                continue
            results.append(({"impl": "fused", "strip_rows": strip}, t))
    best = min(results, key=lambda r: r[1])
    cfg = dict(best[0], secs=best[1])
    _CACHE[key] = cfg
    return cfg


def best_config(shape, wavelet="cdf97", dtype=jnp.float32) -> Optional[Dict]:
    """Cached winner for a shape, or None if not tuned yet."""
    return _CACHE.get(_key(shape, dtype, wavelet))
