"""Synthetic test images and comparison predicates.

Replicates dwt_util_test_image_fill_s (/root/reference/src/libdwt.c:1338,
value generator :1201-1246) and the compare predicates with eps=1e-3
(/root/reference/src/libdwt.c:1593-1620).
"""
from __future__ import annotations

import numpy as np

#: float round-trip tolerance used throughout the reference
#: (/root/reference/src/libdwt.c:1604).
EPS = 1.0e-3


def test_image(size_y: int, size_x: int, rand: int = 0, type: int = 0, dtype=np.float32):
    """The reference's synthetic test pattern (1-based coordinates)."""
    y = np.arange(1, size_y + 1, dtype=np.int64)[:, None]
    x = np.arange(1, size_x + 1, dtype=np.int64)[None, :]
    if type == 0:
        xs = x >> rand
        img = 2.0 * xs * y / (xs * xs + y * y + 1.0)
    elif type == 2:
        i = (x ^ y) & 0xFF
        img = i / 32.0
    elif type == 3:
        v = (((x & 1) << 1) | (y & 1)) + 1
        img = v / 4.0
    else:
        raise ValueError(f"unknown test image type {type}")
    img = np.asarray(img, dtype=np.float64)
    if np.issubdtype(np.dtype(dtype), np.integer):
        # integer variant quantizes the float pattern like the reference's
        # _i_i generator (value scaled into integer range by the caller);
        # we scale to 8-bit-like range for reversible-transform tests.
        return np.asarray(img * 255.0, dtype=dtype)
    return np.asarray(img, dtype=dtype)


def max_abs_err(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.size == 0:
        return 0.0
    return float(np.max(np.abs(a - b)))


def compare(a, b, eps: float = EPS) -> bool:
    """dwt_util_compare_s analogue: max abs error <= eps."""
    return max_abs_err(a, b) <= eps


def psnr(ref, x, peak: float | None = None) -> float:
    ref = np.asarray(ref, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    mse = float(np.mean((ref - x) ** 2))
    if mse == 0:
        return float("inf")
    if peak is None:
        peak = float(np.max(np.abs(ref)))
    return 10.0 * np.log10(peak * peak / mse)
