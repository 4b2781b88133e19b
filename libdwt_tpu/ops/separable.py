"""Separable multi-level DWT/MRA transforms (the correctness oracle).

Reproduces the reference's classic separable API semantics
(dwt_cdf97_2f_s and friends, /root/reference/src/libdwt.c:12451-18533):
per level, a row pass (along x) then a column pass (along y) over the
top-left region of size ceil(n / 2**j), with L|H packed halves.  Here the
per-line OpenMP loop becomes batched vectorized lifting (XLA parallelizes
within a chip; ``parallel.sharded`` distributes across chips).

Two coefficient layouts are provided, both present in the reference:
  * packed  — single array, L|H halves per level (fdwt*/idwt* functions);
  * pytree  — list of subband arrays (wavedec*/waverec*), the natural
    JAX/TPU form (no in-place region updates, no strided aliasing).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from libdwt_tpu.ops.lifting import lift_fwd, lift_inv
from libdwt_tpu.utils.subband import ceil_div_pow2, resolve_j

__all__ = [
    "dwt1",
    "idwt1",
    "dwt2_level",
    "idwt2_level",
    "dwt3_level",
    "idwt3_level",
    "wavedec1",
    "waverec1",
    "wavedec2",
    "waverec2",
    "wavedec3",
    "waverec3",
    "fdwt1",
    "idwt1_packed",
    "fdwt2",
    "idwt2",
    "fdwt3",
    "idwt3",
]


# ------------------------------------------------------------- single level

def dwt1(x, wavelet="cdf97", axis=-1):
    """Single-level 1-D forward transform -> (L, H)."""
    return lift_fwd(x, wavelet, axis=axis)


def idwt1(low, high, wavelet="cdf97", axis=-1, border="mirror"):
    """Single-level 1-D inverse transform.  ``border`` selects the
    virtual-sample mode for sparse reconstruction ('mirror'/'hole'/
    'zero', see :func:`libdwt_tpu.ops.lifting.lift_inv`)."""
    return lift_inv(low, high, wavelet, axis=axis, border=border)


def dwt2_level(x, wavelet="cdf97"):
    """Single-level 2-D transform over the last two axes -> (LL, HL, LH, HH).

    Row pass (along x) then column pass (along y), exactly the reference's
    order (/root/reference/src/libdwt.c:12489-12508), so float results match
    bit-for-bit modulo association inside a step.
    """
    l, h = lift_fwd(x, wavelet, axis=-1)
    ll, lh = lift_fwd(l, wavelet, axis=-2)
    hl, hh = lift_fwd(h, wavelet, axis=-2)
    return ll, hl, lh, hh


def idwt2_level(ll, hl, lh, hh, wavelet="cdf97", border="mirror"):
    """Inverse of :func:`dwt2_level`.  ``border`` gives the sparse-
    reconstruction variants: 'hole' = dwt_cdf97_2i_inplace_hole_s,
    'zero' = dwt_cdf97_2i_inplace_zero_s
    (/root/reference/src/libdwt.h:909-933)."""
    l = lift_inv(ll, lh, wavelet, axis=-2, border=border)
    h = lift_inv(hl, hh, wavelet, axis=-2, border=border)
    return lift_inv(l, h, wavelet, axis=-1, border=border)


def dwt3_level(x, wavelet="cdf97"):
    """Single-level 3-D transform over the last three axes.

    Returns a dict keyed by subband name in (z, y, x) order, e.g. 'LLL',
    'LLH' (highpass along x), ..., 'HHH'.  Axis order: x, then y, then z —
    the separable decomposition of /root/reference/src/volume-dwt.c.
    """
    bands = {"": x}
    for axis, pos in ((-1, 2), (-2, 1), (-3, 0)):
        new = {}
        for name, arr in bands.items():
            lo, hi = lift_fwd(arr, wavelet, axis=axis)
            new["L" + name] = lo
            new["H" + name] = hi
        bands = new
    return bands


def idwt3_level(bands, wavelet="cdf97", border="mirror"):
    """Inverse of :func:`dwt3_level`.  ``border`` selects the sparse-
    reconstruction virtual-sample mode ('mirror'/'hole'/'zero'), as in
    the 2-D path."""
    for axis in (-3, -2, -1):
        new = {}
        names = sorted({n[1:] for n in bands})
        for name in names:
            new[name] = lift_inv(bands["L" + name], bands["H" + name],
                                 wavelet, axis=axis, border=border)
        bands = new
    return bands[""]


# --------------------------------------------------------------- pytree MRA

def wavedec1(x, wavelet="cdf97", level: Optional[int] = None, axis=-1):
    """Multi-level 1-D MRA -> [L_J, H_J, ..., H_1]."""
    n = x.shape[axis]
    j = resolve_j(n, n, level)
    coeffs = []
    low = x
    for _ in range(j):
        low, high = lift_fwd(low, wavelet, axis=axis)
        coeffs.append(high)
    return [low] + coeffs[::-1]


def waverec1(coeffs, wavelet="cdf97", axis=-1):
    low = coeffs[0]
    for high in coeffs[1:]:
        low = lift_inv(low, high, wavelet, axis=axis)
    return low


def wavedec2(x, wavelet="cdf97", level: Optional[int] = None):
    """Multi-level 2-D MRA -> [LL_J, (HL_J, LH_J, HH_J), ..., (HL_1, LH_1, HH_1)]."""
    h, w = x.shape[-2], x.shape[-1]
    j = resolve_j(h, w, level)
    coeffs = []
    ll = x
    for _ in range(j):
        ll, hl, lh, hh = dwt2_level(ll, wavelet)
        coeffs.append((hl, lh, hh))
    return [ll] + coeffs[::-1]


def waverec2(coeffs, wavelet="cdf97", border="mirror"):
    ll = coeffs[0]
    for hl, lh, hh in coeffs[1:]:
        ll = idwt2_level(ll, hl, lh, hh, wavelet, border=border)
    return ll


def wavedec3(x, wavelet="cdf97", level: Optional[int] = None):
    """Multi-level 3-D MRA -> [LLL_J, bands_J, ..., bands_1]; bands_j is the
    dict of 7 detail subbands at level j."""
    dims = x.shape[-3:]
    j = resolve_j(min(dims), min(dims), level)
    coeffs = []
    low = x
    for _ in range(j):
        bands = dwt3_level(low, wavelet)
        low = bands.pop("LLL")
        coeffs.append(bands)
    return [low] + coeffs[::-1]


def waverec3(coeffs, wavelet="cdf97", border="mirror"):
    low = coeffs[0]
    for bands in coeffs[1:]:
        full = dict(bands)
        full["LLL"] = low
        low = idwt3_level(full, wavelet, border=border)
    return low


# --------------------------------------------------------------- packed MRA

def _pack2(ll, hl, lh, hh):
    top = jnp.concatenate([ll, hl], axis=-1)
    bot = jnp.concatenate([lh, hh], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _unpack2(a, n_y, n_x):
    cy, cx = -(-n_y // 2), -(-n_x // 2)
    return (
        a[..., :cy, :cx],
        a[..., :cy, cx:n_x],
        a[..., cy:n_y, :cx],
        a[..., cy:n_y, cx:n_x],
    )


def fdwt1(x, wavelet="cdf97", level: Optional[int] = None, axis=-1):
    """Multi-level packed 1-D forward transform (L|H halves in one array)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    j = resolve_j(n, n, level)
    y = x
    for lvl in range(j):
        nj = ceil_div_pow2(n, lvl)
        lo, hi = lift_fwd(y[..., :nj], wavelet, axis=-1)
        y = y.at[..., :nj].set(jnp.concatenate([lo, hi], axis=-1))
    return jnp.moveaxis(y, -1, axis)


def idwt1_packed(y, wavelet="cdf97", level: Optional[int] = None, axis=-1,
                 border="mirror"):
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    j = resolve_j(n, n, level)
    x = y
    for lvl in range(j - 1, -1, -1):
        nj = ceil_div_pow2(n, lvl)
        c = -(-nj // 2)
        rec = lift_inv(x[..., :c], x[..., c:nj], wavelet, axis=-1,
                       border=border)
        x = x.at[..., :nj].set(rec)
    return jnp.moveaxis(x, -1, axis)


def fdwt2(x, wavelet="cdf97", level: Optional[int] = None):
    """Multi-level packed 2-D forward transform — dwt_cdf97_2f_s semantics
    (/root/reference/src/libdwt.c:12776-12924) with L|H halved layout."""
    x = jnp.asarray(x)
    h, w = x.shape[-2], x.shape[-1]
    j = resolve_j(h, w, level)
    y = x
    for lvl in range(j):
        hj, wj = ceil_div_pow2(h, lvl), ceil_div_pow2(w, lvl)
        region = y[..., :hj, :wj]
        ll, hl, lh, hh = dwt2_level(region, wavelet)
        y = y.at[..., :hj, :wj].set(_pack2(ll, hl, lh, hh))
    return y


def idwt2(y, wavelet="cdf97", level: Optional[int] = None, border="mirror"):
    """Inverse of :func:`fdwt2` (dwt_cdf97_2i_s, /root/reference/src/libdwt.c:17040).
    ``border`` selects the sparse-reconstruction virtual-sample mode
    ('mirror'/'hole'/'zero', /root/reference/src/libdwt.h:909-933)."""
    y = jnp.asarray(y)
    h, w = y.shape[-2], y.shape[-1]
    j = resolve_j(h, w, level)
    x = y
    for lvl in range(j - 1, -1, -1):
        hj, wj = ceil_div_pow2(h, lvl), ceil_div_pow2(w, lvl)
        ll, hl, lh, hh = _unpack2(x[..., :hj, :wj], hj, wj)
        rec = idwt2_level(ll, hl, lh, hh, wavelet, border=border)
        x = x.at[..., :hj, :wj].set(rec)
    return x


def fdwt3(x, wavelet="cdf97", level: Optional[int] = None):
    """Multi-level packed 3-D forward transform over the last three axes."""
    x = jnp.asarray(x)
    dz, dy, dx = x.shape[-3:]
    j = resolve_j(min(dz, dy, dx), min(dz, dy, dx), level)
    y = x
    for lvl in range(j):
        sz = [ceil_div_pow2(d, lvl) for d in (dz, dy, dx)]
        region = y[..., : sz[0], : sz[1], : sz[2]]
        bands = dwt3_level(region, wavelet)
        # pack along x, then y, then z
        def cat(lo, hi, ax):
            return jnp.concatenate([lo, hi], axis=ax)

        # assemble explicitly: names are in (z,y,x) order
        x_packed = {}
        for zy in ("LL", "LH", "HL", "HH"):
            x_packed[zy] = cat(bands[zy + "L"], bands[zy + "H"], -1)
        y_packed = {}
        for z in ("L", "H"):
            y_packed[z] = cat(x_packed[z + "L"], x_packed[z + "H"], -2)
        packed = cat(y_packed["L"], y_packed["H"], -3)
        y = y.at[..., : sz[0], : sz[1], : sz[2]].set(packed)
    return y


def idwt3(yv, wavelet="cdf97", level: Optional[int] = None,
          border="mirror"):
    """Inverse of :func:`fdwt3`."""
    yv = jnp.asarray(yv)
    dz, dy, dx = yv.shape[-3:]
    j = resolve_j(min(dz, dy, dx), min(dz, dy, dx), level)
    x = yv
    for lvl in range(j - 1, -1, -1):
        sz = [ceil_div_pow2(d, lvl) for d in (dz, dy, dx)]
        cz, cy, cx = (-(-s // 2) for s in sz)
        region = x[..., : sz[0], : sz[1], : sz[2]]
        bands = {}
        for iz, z in ((slice(0, cz), "L"), (slice(cz, sz[0]), "H")):
            for iy, yn in ((slice(0, cy), "L"), (slice(cy, sz[1]), "H")):
                for ix, xn in ((slice(0, cx), "L"), (slice(cx, sz[2]), "H")):
                    bands[z + yn + xn] = region[..., iz, iy, ix]
        rec = idwt3_level(bands, wavelet, border=border)
        x = x.at[..., : sz[0], : sz[1], : sz[2]].set(rec)
    return x
