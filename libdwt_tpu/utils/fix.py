"""Fixed-point Q-format types and lifting arithmetic.

Analogue of /root/reference/examples/cores/fix.h:
  * FIX32 = int32 Q16.15 (sign + 16 int + 15 frac, FIX32_N = 16 there
    counts the fractional shift; values scale by 2^16)… the reference
    uses M=15/N=16: one = 1<<16, half = 1<<15;
  * FIX16 = int16 Q6.9 (M=6, N=9: one = 1<<9);
  * rounding multiplication fix_mul(x, y) = (x*y + half) >> N with a
    wide intermediate (fix.h fix32_mul uses int64).

The reversible integer transforms (bit-exact) live in ops.lifting's
int path; this module provides the *approximate* fixed-point arithmetic
the reference's cores example explores (cores.c cdf97 v2x2 fix32/fix16),
implemented with the same lifting steps but Q-format constants.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import get_wavelet

__all__ = [
    "FIX32",
    "FIX16",
    "to_fix",
    "from_fix",
    "fix_mul",
    "lift_fwd_fix",
    "lift_inv_fix",
    "dwt2_fix",
    "idwt2_fix",
]


@dataclasses.dataclass(frozen=True)
class QFormat:
    name: str
    dtype: object
    n: int  # fractional bits (shift)
    wide: object  # wide dtype for products

    @property
    def one(self) -> int:
        return 1 << self.n

    @property
    def half(self) -> int:
        return 1 << (self.n - 1)


#: Q16.15-ish int32 (one = 1<<16) — /root/reference/examples/cores/fix.h:7-13
FIX32 = QFormat("fix32", jnp.int32, 16, jnp.int64)
#: Q6.9 int16 (one = 1<<9) — /root/reference/examples/cores/fix.h:21-26
FIX16 = QFormat("fix16", jnp.int16, 9, jnp.int32)


def to_fix(x, q: QFormat = FIX32) -> jax.Array:
    """conv_float32_to_fix: C roundf = round half AWAY FROM ZERO
    (fix.h:28-33; jnp.round would round ties to even)."""
    v = jnp.asarray(x, jnp.float32) * q.one
    return jnp.where(
        v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5)
    ).astype(q.dtype)


def from_fix(x, q: QFormat = FIX32) -> jax.Array:
    return jnp.asarray(x, jnp.float32) / q.one


def fix_mul(x, y, q: QFormat = FIX32) -> jax.Array:
    """(x*y + half) >> n with a wide intermediate (fix.h fix32_mul).

    FIX16 products fit int32.  FIX32 (n=16) would need int64 — which
    TPUs lack and jax truncates without x64 — so the 64-bit product is
    decomposed exactly into int32 partial products:

      (x*y + half) >> 16 = xh*y + xl*yh + ((xl*yl + half) >> 16)

    with x = xh*2^16 + xl, y = yh*2^16 + yl (arithmetic-shift split),
    and the unsigned 32-bit xl*yl evaluated via an 8-bit sub-split.
    """
    x = jnp.asarray(x, q.dtype)
    y = jnp.asarray(y, q.dtype)
    if q.n != 16:
        wide = x.astype(q.wide) * y.astype(q.wide) + q.half
        return jax.lax.shift_right_arithmetic(
            wide, jnp.asarray(q.n, q.wide)
        ).astype(q.dtype)
    i32 = jnp.int32
    x = x.astype(i32)
    y = y.astype(i32)
    sra = jax.lax.shift_right_arithmetic
    xh = sra(x, jnp.asarray(16, i32))
    xl = jnp.bitwise_and(x, 0xFFFF)
    yh = sra(y, jnp.asarray(16, i32))
    yl = jnp.bitwise_and(y, 0xFFFF)
    a = sra(xl, jnp.asarray(8, i32))
    b = jnp.bitwise_and(xl, 0xFF)
    t = b * yl + q.half
    p = sra(a * yl + sra(t, jnp.asarray(8, i32)), jnp.asarray(8, i32))
    return (xh * y + xl * yh + p).astype(q.dtype)


def lift_fwd_fix(x, wavelet="cdf97", q: QFormat = FIX32) -> Tuple[jax.Array, jax.Array]:
    """Forward lifting on Q-format data along the last axis.

    Same step structure as the float engine (mirrored borders), with
    every coefficient quantized to the Q format and rounding
    multiplications — the cores2f_cdf97_v2x2_i32 arithmetic
    (/root/reference/examples/cores/cores.c + fix.h).
    """
    from libdwt_tpu.ops.lifting import _d_neighbors, _s_neighbors

    wavelet = get_wavelet(wavelet)
    s, d = x[..., 0::2], x[..., 1::2]
    nl, nh = s.shape[-1], d.shape[-1]
    if x.shape[-1] < 2:
        # reference small-N rule: scale the single sample, empty high
        if wavelet.scale_s is not None and x.shape[-1] == 1:
            s = fix_mul(s, to_fix(wavelet.scale_s, q), q)
        return s, d
    for st in wavelet.steps:
        if st.target == "d":
            l, r = _d_neighbors(s, nh)
        else:
            l, r = _s_neighbors(d, nl)
        if st.is_symmetric:
            # one rounded multiply on the SUM — op_x32's fix32_mul(w, l+r)
            # (/root/reference/examples/cores/cores.c:66-76)
            upd = fix_mul(l + r, to_fix(st.coeff, q), q)
        else:
            upd = (fix_mul(l, to_fix(st.left, q), q)
                   + fix_mul(r, to_fix(st.right, q), q))
        if st.target == "d":
            d = d + upd
        else:
            s = s + upd
    if wavelet.scale_s is not None:
        s = fix_mul(s, to_fix(wavelet.scale_s, q), q)
        d = fix_mul(d, to_fix(wavelet.scale_d, q), q)
    return s, d


def lift_inv_fix(s, d, wavelet="cdf97", q: QFormat = FIX32) -> jax.Array:
    """Approximate inverse of :func:`lift_fwd_fix` (quantization means
    the round trip is close but not bit-exact, as in the reference's
    fixed-point cores, verified by MSE in examples/cores/main.c:53-84)."""
    from libdwt_tpu.ops.lifting import (
        _d_neighbors, _inv_scales, _s_neighbors,
    )

    wavelet = get_wavelet(wavelet)
    nl, nh = s.shape[-1], d.shape[-1]
    if nl + nh < 2:
        if wavelet.scale_s is not None and nl == 1:
            inv_s, _ = _inv_scales(wavelet)
            s = fix_mul(s, to_fix(inv_s, q), q)
        return s
    if wavelet.scale_s is not None:
        inv_s, inv_d = _inv_scales(wavelet)
        s = fix_mul(s, to_fix(inv_s, q), q)
        d = fix_mul(d, to_fix(inv_d, q), q)
    for st in wavelet.steps[::-1]:
        if st.target == "d":
            l, r = _d_neighbors(s, nh)
        else:
            l, r = _s_neighbors(d, nl)
        if st.is_symmetric:
            upd = fix_mul(l + r, to_fix(st.coeff, q), q)
        else:
            upd = (fix_mul(l, to_fix(st.left, q), q)
                   + fix_mul(r, to_fix(st.right, q), q))
        if st.target == "d":
            d = d - upd
        else:
            s = s - upd
    n = nl + nh
    out = jnp.zeros(s.shape[:-1] + (n,), s.dtype)
    out = out.at[..., 0::2].set(s)
    out = out.at[..., 1::2].set(d)
    return out


def _col_apply(fn, *arrays):
    """Apply a last-axis pair-function along axis -2 via a swapaxes
    sandwich (XLA fuses the transposes; no strided tricks needed on
    the oracle-precision path)."""
    swapped = [jnp.swapaxes(a, -1, -2) for a in arrays]
    out = fn(*swapped)
    if isinstance(out, tuple):
        return tuple(jnp.swapaxes(o, -1, -2) for o in out)
    return jnp.swapaxes(out, -1, -2)


def dwt2_fix(x, wavelet="cdf97", q: QFormat = FIX32
             ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-level 2-D fixed-point analysis -> (LL, HL, LH, HH).

    The 2-D Q-format transform of the reference's cores example —
    cores2f_cdf97_v2x2_i32 / the FIX16 5/3 variants
    (/root/reference/examples/cores/cores.c, cores.h:17-60; Q formats
    fix.h:7-26) — as row then column passes of :func:`lift_fwd_fix`
    (the 2x2 core fuses the same two passes per output pixel; the
    arithmetic per sample is identical: one rounded multiply per
    symmetric step and per scaling).

    ``x`` is Q-format data (:func:`to_fix`); subband layout matches
    :func:`libdwt_tpu.ops.separable.dwt2_level`.
    """
    l, h = lift_fwd_fix(x, wavelet, q)              # row pass (lanes)
    ll, lh = _col_apply(lambda a: lift_fwd_fix(a, wavelet, q), l)
    hl, hh = _col_apply(lambda a: lift_fwd_fix(a, wavelet, q), h)
    return ll, hl, lh, hh


def idwt2_fix(ll, hl, lh, hh, wavelet="cdf97", q: QFormat = FIX32
              ) -> jax.Array:
    """Single-level 2-D fixed-point synthesis (inverse of
    :func:`dwt2_fix`).  Quantization makes the round trip approximate
    — the reference verifies its fixed-point cores by MSE against the
    float transform (/root/reference/examples/cores/main.c:53-84), and
    tests/test_fix2d.py holds this path to the same standard."""
    l = _col_apply(lambda a, b: lift_inv_fix(a, b, wavelet, q), ll, lh)
    h = _col_apply(lambda a, b: lift_inv_fix(a, b, wavelet, q), hl, hh)
    return lift_inv_fix(l, h, wavelet, q)
