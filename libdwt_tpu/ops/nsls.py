"""Non-separable 2-D lifting (NSLS) transform variant.

Analogue of the reference's NSLS cores
(/root/reference/examples/cores/cores-nsls.c): instead of a row pass
followed by a column pass, each lifting stage is applied as ONE 2-D
stencil sweep.  Merging the x-application and y-application of a step
with coefficient c gives, on the interleaved layout,

  odd-odd  (both passes):  t += c*(left+right) + c*(up+down)
                               + c^2*(four diagonals)
  odd-even (x pass only):  t += c*(left+right)
  even-odd (y pass only):  t += c*(up+down)

which is exactly the reference's squared-coefficient scheme
(H11 = H1*H1 etc., cores-nsls.c:42-62), and the merged scaling
SZ = zeta^2 / SR = 1/zeta^2 per quadrant parity.  The result equals
the separable transform in exact arithmetic and differs only in float
rounding — the same relationship the reference's NSLS cores have to
its separable transforms.

Borders use whole-point mirror extension (host-side reflect padding),
matching the fused kernels.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import Wavelet, get_wavelet

__all__ = ["nsls_dwt2_level", "nsls_idwt2_level"]

_PAD = 4  # enough mirror halo for up to 4 lifting stages


def _parity(shape, axis, odd):
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=axis)
    return (ids % 2 == 1) if odd else (ids % 2 == 0)


def _merged_step(t, c, target_odd: bool):
    """One non-separable stage on interleaved data.

    ``target_odd`` selects the lifting target parity: True for predict
    stages (odd samples / high channel), False for update stages.
    """
    cy = jnp.asarray(c, t.dtype)
    c2 = jnp.asarray(c * c, t.dtype)
    row = jnp.roll(t, 1, 1) + jnp.roll(t, -1, 1)
    col = jnp.roll(t, 1, 0) + jnp.roll(t, -1, 0)
    diag = (
        jnp.roll(jnp.roll(t, 1, 0), 1, 1)
        + jnp.roll(jnp.roll(t, 1, 0), -1, 1)
        + jnp.roll(jnp.roll(t, -1, 0), 1, 1)
        + jnp.roll(jnp.roll(t, -1, 0), -1, 1)
    )
    ox = _parity(t.shape, 1, target_odd)
    oy = _parity(t.shape, 0, target_odd)
    both = ox & oy
    only_x = ox & ~oy
    only_y = ~ox & oy
    out = t
    out = jnp.where(both, t + cy * row + cy * col + c2 * diag, out)
    out = jnp.where(only_x, t + cy * row, out)
    out = jnp.where(only_y, t + cy * col, out)
    return out


def _merged_scale(t, wavelet: Wavelet, inverse: bool):
    if wavelet.scale_s is None:
        return t
    if inverse:
        lo = wavelet.inv_scale_s if wavelet.inv_scale_s is not None else wavelet.scale_d
        hi = wavelet.inv_scale_d if wavelet.inv_scale_d is not None else wavelet.scale_s
    else:
        lo, hi = wavelet.scale_s, wavelet.scale_d
    lo = jnp.asarray(lo, t.dtype)
    hi = jnp.asarray(hi, t.dtype)
    fy = jnp.where(_parity(t.shape, 0, False), lo, hi)
    fx = jnp.where(_parity(t.shape, 1, False), lo, hi)
    return t * fy * fx


def _check(wavelet):
    if any(not st.is_symmetric for st in wavelet.steps):
        raise ValueError("NSLS needs symmetric lifting steps (CDF families)")


def nsls_dwt2_level(x, wavelet="cdf97") -> Tuple[jax.Array, ...]:
    """Single-level 2-D forward via non-separable merged stages
    -> (LL, HL, LH, HH); equals dwt2_level up to float rounding."""
    wavelet = get_wavelet(wavelet)
    _check(wavelet)
    h, w = x.shape[-2], x.shape[-1]
    t = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(_PAD, _PAD + h % 2), (_PAD, _PAD + w % 2)],
                mode="reflect")
    flat = t.reshape((-1,) + t.shape[-2:])

    def one(img):
        u = img
        for st in wavelet.steps:
            u = _merged_step(u, st.coeff, st.target == "d")
        u = _merged_scale(u, wavelet, inverse=False)
        return u

    out = jax.vmap(one)(flat).reshape(t.shape)
    he, we = h + h % 2, w + w % 2
    v = out[..., _PAD : _PAD + he, _PAD : _PAD + we]
    ll = v[..., 0::2, 0::2]
    hl = v[..., 0::2, 1::2]
    lh = v[..., 1::2, 0::2]
    hh = v[..., 1::2, 1::2]
    cy, cx = -(-h // 2), -(-w // 2)
    fy, fx = h // 2, w // 2
    return ll[..., :cy, :cx], hl[..., :cy, :fx], lh[..., :fy, :cx], hh[..., :fy, :fx]


def nsls_idwt2_level(ll, hl, lh, hh, wavelet="cdf97"):
    """Inverse of :func:`nsls_dwt2_level` (merged stages reversed with
    negated coefficients; the diagonal term is (-c)^2 = c^2)."""
    wavelet = get_wavelet(wavelet)
    _check(wavelet)
    from libdwt_tpu.ops.fused import _pad_channel_mirror, CH

    cy, cx = ll.shape[-2], ll.shape[-1]
    fy, fx = hh.shape[-2], hh.shape[-1]
    h, w = cy + fy, cx + fx
    if min(cy, cx, fy, fx) <= CH:
        # the channel mirror slices up to row CH; a shorter band would
        # silently build a wrong halo
        raise ValueError(
            f"nsls inverse needs bands > {CH} samples per axis; "
            f"got LL {ll.shape[-2:]} / HH {hh.shape[-2:]}"
        )

    # build the interleaved extended tile host-side: mirror channels by
    # CH, interleave, then run the merged inverse stages.
    def ext(band, low_y, low_x):
        b = _pad_channel_mirror(band, h, low_y, axis=band.ndim - 2)
        b = _pad_channel_mirror(b, w, low_x, axis=band.ndim - 1)
        return b

    llp = ext(ll, True, True)
    hlp = ext(hl, True, False)
    lhp = ext(lh, False, True)
    hhp = ext(hh, False, False)
    ny, nx = llp.shape[-2], llp.shape[-1]
    t = jnp.zeros(llp.shape[:-2] + (2 * ny, 2 * nx), llp.dtype)
    t = t.at[..., 0::2, 0::2].set(llp)
    t = t.at[..., 0::2, 1::2].set(hlp)
    t = t.at[..., 1::2, 0::2].set(lhp)
    t = t.at[..., 1::2, 1::2].set(hhp)

    # _merged_step/_merged_scale roll and parity-mask axes 0/1: flatten
    # any batch axes and vmap, exactly like the forward path
    flat = t.reshape((-1,) + t.shape[-2:])

    def one(img):
        u = _merged_scale(img, wavelet, inverse=True)
        for st in wavelet.steps[::-1]:
            u = _merged_step(u, -st.coeff, st.target == "d")
        return u

    t = jax.vmap(one)(flat).reshape(t.shape)
    off = 2 * CH
    return t[..., off : off + h, off : off + w]
