"""In-place-style transforms with INTERLEAVED subband layout.

TPU-native analogue of the reference's dwt-simple layer
(/root/reference/src/dwt-simple.c, .h): forward transforms that leave
every coefficient at its spatial position — level-j coefficients live
at stride-2^j grid positions — instead of packing L|H halves.  The
reference ships explicit horizontal/vertical/diagonal vectorization
variants of this layout (fdwt2_cdf97_{vertical,horizontal,diagonal}_s,
dwt-simple.c:1615,2224,3034); on TPU those collapse into one batched
formulation, so this module provides the LAYOUT (and conversions to the
packed layout), not a kernel zoo.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from libdwt_tpu.ops.lifting import lift_fwd, lift_inv, merge, split
from libdwt_tpu.utils.subband import ceil_div_pow2, resolve_j

__all__ = [
    "fdwt1_interleaved",
    "idwt1_interleaved",
    "fdwt2_interleaved",
    "idwt2_interleaved",
    "interleaved_to_packed2",
    "packed_to_interleaved2",
]


def _level_fwd(v, wavelet, axis):
    lo, hi = lift_fwd(v, wavelet, axis=axis)
    return merge(lo, hi, axis=axis)


def _level_inv(v, wavelet, axis):
    lo, hi = split(v, axis=axis)
    return lift_inv(lo, hi, wavelet, axis=axis)


def fdwt1_interleaved(x, wavelet="cdf97", level: Optional[int] = None, axis=-1):
    """Multi-level 1-D forward, interleaved layout: level-j highs at
    positions (2^j)(2k+1), final lows at stride 2^level."""
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    j = resolve_j(n, n, level)
    y = x
    for lvl in range(j):
        step = 1 << lvl
        v = y[..., ::step]
        y = y.at[..., ::step].set(_level_fwd(v, wavelet, -1))
    return jnp.moveaxis(y, -1, axis)


def idwt1_interleaved(y, wavelet="cdf97", level: Optional[int] = None, axis=-1):
    y = jnp.moveaxis(jnp.asarray(y), axis, -1)
    n = y.shape[-1]
    j = resolve_j(n, n, level)
    x = y
    for lvl in range(j - 1, -1, -1):
        step = 1 << lvl
        v = x[..., ::step]
        x = x.at[..., ::step].set(_level_inv(v, wavelet, -1))
    return jnp.moveaxis(x, -1, axis)


def fdwt2_interleaved(x, wavelet="cdf97", level: Optional[int] = None):
    """Multi-level 2-D forward in the interleaved layout of dwt-simple
    (fdwt2_cdf97_* semantics: rows then columns per level, in place)."""
    x = jnp.asarray(x)
    h, w = x.shape[-2], x.shape[-1]
    j = resolve_j(h, w, level)
    y = x
    for lvl in range(j):
        step = 1 << lvl
        v = y[..., ::step, ::step]
        v = _level_fwd(v, wavelet, -1)
        v = _level_fwd(v, wavelet, -2)
        y = y.at[..., ::step, ::step].set(v)
    return y


def idwt2_interleaved(y, wavelet="cdf97", level: Optional[int] = None):
    y = jnp.asarray(y)
    h, w = y.shape[-2], y.shape[-1]
    j = resolve_j(h, w, level)
    x = y
    for lvl in range(j - 1, -1, -1):
        step = 1 << lvl
        v = x[..., ::step, ::step]
        v = _level_inv(v, wavelet, -2)
        v = _level_inv(v, wavelet, -1)
        x = x.at[..., ::step, ::step].set(v)
    return x


def interleaved_to_packed2(y, level: int):
    """Convert an interleaved 2-D transform to the packed L|H layout
    (both layouts exist in the reference; dwt_util_subband addresses the
    packed one, /root/reference/src/libdwt.c:20731)."""
    y = jnp.asarray(y)
    h, w = y.shape[-2], y.shape[-1]
    out = y
    # After compacting level j, the deeper structure sits contiguously in
    # the top-left region, again "interleaved at stride 1" one level down.
    for lvl in range(level):
        hj, wj = ceil_div_pow2(h, lvl), ceil_div_pow2(w, lvl)
        v = out[..., :hj, :wj]
        lo, hi = split(v, axis=-1)
        v = jnp.concatenate([lo, hi], axis=-1)
        lo, hi = split(v, axis=-2)
        v = jnp.concatenate([lo, hi], axis=-2)
        out = out.at[..., :hj, :wj].set(v)
    return out


def packed_to_interleaved2(y, level: int):
    """Inverse of :func:`interleaved_to_packed2`."""
    y = jnp.asarray(y)
    h, w = y.shape[-2], y.shape[-1]
    out = y
    for lvl in range(level - 1, -1, -1):
        hj, wj = ceil_div_pow2(h, lvl), ceil_div_pow2(w, lvl)
        v = out[..., :hj, :wj]
        cy, cx = -(-hj // 2), -(-wj // 2)
        v = merge(v[..., :cy, :], v[..., cy:, :], axis=-2)
        v = merge(v[..., :, :cx], v[..., :, cx:], axis=-1)
        out = out.at[..., :hj, :wj].set(v)
    return out
