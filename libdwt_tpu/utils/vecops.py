"""Vector/image manipulation utilities.

Analogues of the reference's signal/image math helpers
(/root/reference/src/libdwt.c:25361-26227; decls libdwt.h:3456-3776):
abs, dot, lp-normalize, add, mul, min/max, constant shift, min-max
rescale, per-row median shift, signal displacement with clamp/zero
fill, p-norm center of mass and iterative centering, viewport/crop.

All are jnp expressions batched over leading axes; the per-row "21"
variants map the reference's per-y loops onto one vectorized call.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from libdwt_tpu.ops.features import band_lpnorm, band_med

__all__ = [
    "vec_abs",
    "dot",
    "normalize",
    "add",
    "mul",
    "find_min_max",
    "shift",
    "scale",
    "shift21_med",
    "scale21",
    "displace1",
    "displace1_zero",
    "get_center1",
    "center1",
    "center21",
    "viewport",
    "crop21",
]


def vec_abs(x):
    """dwt_util_abs_s."""
    return jnp.abs(x)


def dot(a, b):
    """dwt_util_dot_s."""
    return jnp.sum(jnp.asarray(a) * jnp.asarray(b))


def normalize(x, p: float = 2.0):
    """Divide by the lp norm (dwt_util_normalize_s; the norm is the
    reference's sum(|c|^p)^(1/p) over the LAST TWO axes, batched over
    any leading axes)."""
    x = jnp.asarray(x)
    x2 = x.reshape((1, -1)) if x.ndim == 1 else x
    norm = band_lpnorm(x2, p)
    if x.ndim == 1:
        return x / norm.reshape(())
    # broadcast the (batch...)-shaped norm back over the two reduced axes
    return x / norm[..., None, None]


def add(a, b):
    """dwt_util_add_s."""
    return jnp.asarray(a) + jnp.asarray(b)


def mul(a, b):
    """dwt_util_mul_s (elementwise)."""
    return jnp.asarray(a) * jnp.asarray(b)


def find_min_max(x) -> Tuple[jax.Array, jax.Array]:
    """dwt_util_find_min_max_s."""
    x = jnp.asarray(x)
    return jnp.min(x), jnp.max(x)


def shift(x, a):
    """Add a constant (dwt_util_shift_s)."""
    return jnp.asarray(x) + a


def scale(x, lo: float = 0.0, hi: float = 1.0):
    """Min-max rescale into [lo, hi] (dwt_util_scale_s)."""
    x = jnp.asarray(x)
    mn, mx = jnp.min(x), jnp.max(x)
    rng = jnp.where(mx > mn, mx - mn, 1.0)
    return (x - mn) / rng * (hi - lo) + lo


def shift21_med(x):
    """Per-row subtract the row median (dwt_util_shift21_med_s with the
    reference's sorted[size//2] median)."""
    x = jnp.asarray(x)
    med = band_med(x[..., None, :])  # rows as (..., 1, n) bands
    return x - med[..., None]


def scale21(x, lo: float = 0.0, hi: float = 1.0):
    """Per-row min-max rescale (dwt_util_scale21_s)."""
    x = jnp.asarray(x)
    mn = jnp.min(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    rng = jnp.where(mx > mn, mx - mn, 1.0)
    return (x - mn) / rng * (hi - lo) + lo


def displace1(x, displ: int, axis: int = -1):
    """Shift a signal by ``displ`` with edge-clamped sampling
    (dwt_util_displace1_s, /root/reference/src/libdwt.c:25688):
    out[i] = x[clamp(i + displ)]."""
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    idx = jnp.clip(jnp.arange(n) + displ, 0, n - 1)
    return jnp.moveaxis(x[..., idx], -1, axis)


def displace1_zero(x, displ: int, axis: int = -1):
    """Shift with zero fill (dwt_util_displace1_zero_s)."""
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    src = jnp.arange(n) + displ
    valid = (src >= 0) & (src < n)
    out = jnp.where(valid, x[..., jnp.clip(src, 0, n - 1)], 0)
    return jnp.moveaxis(out, -1, axis)


def get_center1(x, p: float = 10.0) -> int:
    """p-norm center of mass (dwt_util_get_center1_s,
    /root/reference/src/libdwt.c:25806): midpoint of the indices where
    the cumulative |x|^p crosses half the total from each side."""
    import numpy as np

    v = np.abs(np.asarray(x)).astype(np.float64) ** p
    if v.ndim != 1:
        raise ValueError("get_center1 takes a 1-D signal")
    total = v.sum()
    n = len(v)
    if total == 0:
        return n // 2
    half = total / 2
    cs = np.cumsum(v)
    ridx = int(np.argmax(cs > half)) - 1
    cs_r = np.cumsum(v[::-1])
    lidx = n - 1 - int(np.argmax(cs_r > half)) + 1
    if ridx < 0 and lidx > n - 1:
        return n // 2
    ridx = max(ridx, 0)
    lidx = min(lidx, n - 1)
    return (lidx + ridx) // 2


def center1(x, max_iters: int = 8, p: float = 10.0):
    """Iteratively displace a signal so its p-norm center sits at n/2
    (dwt_util_center1_s)."""
    import numpy as np

    out = np.asarray(x).copy()
    n = out.shape[-1]
    for _ in range(max_iters):
        c = get_center1(out, p)
        displ = n // 2 - c
        if displ == 0:
            break
        out = np.asarray(displace1_zero(jnp.asarray(out), -displ))
    return out


def center21(x, max_iters: int = 8, p: float = 10.0):
    """Per-row centering (dwt_util_center21_s)."""
    import numpy as np

    out = np.asarray(x).copy()
    for i in range(out.shape[0]):
        out[i] = center1(out[i], max_iters, p)
    return out


def viewport(x, offset_y: int, offset_x: int, size_y: int, size_x: int):
    """Rect view (dwt_util_viewport)."""
    return jnp.asarray(x)[..., offset_y : offset_y + size_y,
                          offset_x : offset_x + size_x]


def crop21(x, offset_x: int, size_x: int):
    """Per-row crop (dwt_util_crop21)."""
    return jnp.asarray(x)[..., offset_x : offset_x + size_x]
