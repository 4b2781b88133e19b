"""Edge-avoiding wavelets (WCDF): data-dependent weighted lifting.

TPU-native analogue of /root/reference/src/eaw-experimental.c (WCDF 9/7)
and the dwt_eaw53_* family in /root/reference/src/libdwt.c:11106,16663.

Per line and per level, prediction weights are computed from adjacent
sample differences,

    w[i] = 1 / (|x[i] - x[i+1]|^alpha + 1e-5)       (eaw-experimental.c:55-71)

and every lifting step becomes a weighted average,

    t[i] += 2*c * (wL*t[i-1] + wR*t[i+1]) / (wL + wR)

with the border rules of the reference (wL = wR = nearest interior
weight; both neighbours collapse to the single existing one).  The
forward transform returns the per-level weights, which the caller must
feed back to the inverse (eaw-experimental.h:30-48) — weights are
data-dependent and cannot be recomputed from coefficients.

The C sequential loops become the same batched polyphase passes as
ops.lifting, with the weight channels split even/odd alongside the data.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import Wavelet, get_wavelet
from libdwt_tpu.ops.lifting import merge
from libdwt_tpu.utils.subband import resolve_j

__all__ = [
    "eaw_weights",
    "eaw_lift_fwd",
    "eaw_lift_inv",
    "eaw_wavedec2",
    "eaw_waverec2",
]

EPS = 1.0e-5


def eaw_weights(x: jax.Array, alpha: float) -> jax.Array:
    """Adjacent-difference weights along the last axis, length N with the
    reference's border patch w[N-1] := w[N-2]
    (/root/reference/src/eaw-experimental.c:63-71 + border uses)."""
    diff = jnp.abs(x[..., :-1] - x[..., 1:])
    w = 1.0 / (diff ** jnp.asarray(alpha, x.dtype) + jnp.asarray(EPS, x.dtype))
    return jnp.concatenate([w, w[..., -1:]], axis=-1)


def _neighbors(s, d, w, n: int):
    """Mirrored value and weight neighbour channels.

    Returns for d-steps: (l, r, wL, wR) of each odd target, and for
    s-steps likewise for each even target, replicating the border rules
    at /root/reference/src/eaw-experimental.c:100-175.
    """
    from libdwt_tpu.ops.lifting import _d_neighbors, _s_neighbors

    nl, nh = s.shape[-1], d.shape[-1]
    we = w[..., 0::2]  # w at even i
    wo = w[..., 1::2]  # w at odd i

    # value channels: the mirror border rules live in ops/lifting
    d_l, d_r = _d_neighbors(s, nh)
    s_l, s_r = _s_neighbors(d, nl)

    # d target i=2k+1: weights w[2k], w[2k+1]
    d_wl = we[..., :nh]
    d_wr = wo[..., :nh]
    # s target i=2k: weights w[2k-1], w[2k] (w[-1] := w[0]; wo/we[-1]
    # already carry the reference's w[N-1] := w[N-2] patch)
    s_wl = jnp.concatenate([we[..., :1], wo[..., : nl - 1]], axis=-1)
    s_wr = we[..., :nl]
    return (d_l, d_r, d_wl, d_wr), (s_l, s_r, s_wl, s_wr)


def _check_eaw_supported(wavelet: Wavelet) -> None:
    """The weighted-lifting formula c*(wL*l + wR*r)/(wL + wR) is the
    weight-split of a SYMMETRIC step's 2c*(l+r)/2; asymmetric steps
    (haar, d4) have no such split (the reference's EAW family is WCDF
    5/3 / 9/7 only, /root/reference/README:19-20)."""
    if any(not st.is_symmetric for st in wavelet.steps):
        raise ValueError(
            f"edge-avoiding lifting needs symmetric steps; "
            f"'{wavelet.name}' is not supported (reference: WCDF 5/3, 9/7)"
        )


def _steps(s, d, w, wavelet: Wavelet, inverse: bool):
    steps = wavelet.steps[::-1] if inverse else wavelet.steps
    sgn = -1.0 if inverse else 1.0
    for st in steps:
        c = jnp.asarray(2.0 * sgn * st.coeff, s.dtype)
        (d_l, d_r, d_wl, d_wr), (s_l, s_r, s_wl, s_wr) = _neighbors(
            s, d, w, s.shape[-1] + d.shape[-1]
        )
        if st.target == "d":
            d = d + c * (d_wl * d_l + d_wr * d_r) / (d_wl + d_wr)
        else:
            s = s + c * (s_wl * s_l + s_wr * s_r) / (s_wl + s_wr)
    return s, d


def eaw_lift_fwd(
    x: jax.Array, wavelet="cdf97", alpha: float = 0.8, axis: int = -1,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Forward weighted 1-D lifting -> (low, high, weights).

    Semantics of dwt_eaw97_f_ex_stride_s
    (/root/reference/src/eaw-experimental.c:73-187).
    """
    wavelet = get_wavelet(wavelet)
    _check_eaw_supported(wavelet)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n < 2:
        sc = jnp.asarray(
            wavelet.scale_s if wavelet.scale_s is not None else 1.0, x.dtype)
        lo = jnp.moveaxis(x * sc, -1, axis)
        return lo, jnp.moveaxis(x[..., :0], -1, axis), jnp.moveaxis(x * 0, -1, axis)
    w = eaw_weights(x, alpha) if weights is None else jnp.moveaxis(weights, axis, -1)
    s, d = x[..., 0::2], x[..., 1::2]
    s, d = _steps(s, d, w, wavelet, inverse=False)
    if wavelet.scale_s is not None:
        s = s * jnp.asarray(wavelet.scale_s, x.dtype)
        d = d * jnp.asarray(wavelet.scale_d, x.dtype)
    return (
        jnp.moveaxis(s, -1, axis),
        jnp.moveaxis(d, -1, axis),
        jnp.moveaxis(w, -1, axis),
    )


def eaw_lift_inv(
    low: jax.Array, high: jax.Array, weights: jax.Array, wavelet="cdf97",
    axis: int = -1,
) -> jax.Array:
    """Inverse of :func:`eaw_lift_fwd` given the forward's weights
    (dwt_eaw97_i_ex_stride_s, /root/reference/src/eaw-experimental.c:189-301)."""
    from libdwt_tpu.ops.lifting import _inv_scales

    wavelet = get_wavelet(wavelet)
    _check_eaw_supported(wavelet)
    s = jnp.moveaxis(low, axis, -1)
    d = jnp.moveaxis(high, axis, -1)
    n = s.shape[-1] + d.shape[-1]
    if n < 2:
        inv_s, _ = _inv_scales(wavelet)
        sc = jnp.asarray(inv_s if inv_s is not None else 1.0, s.dtype)
        return jnp.moveaxis(s * sc, -1, axis)
    w = jnp.moveaxis(weights, axis, -1)
    if wavelet.scale_s is not None:
        inv_s, inv_d = _inv_scales(wavelet)
        s = s * jnp.asarray(inv_s, s.dtype)
        d = d * jnp.asarray(inv_d, d.dtype)
    s, d = _steps(s, d, w, wavelet, inverse=True)
    return jnp.moveaxis(merge(s, d, axis=-1), -1, axis)


# ------------------------------------------------------------- 2-D drivers


def eaw_wavedec2(
    x: jax.Array, wavelet="cdf97", level: Optional[int] = None,
    alpha: float = 0.8,
):
    """Multi-level 2-D EAW MRA -> (coeffs, weights).

    coeffs has the wavedec2 pytree layout; weights is a list (coarse
    first) of per-level (wH, wV) pairs — wH from the rows of the input
    at that level, wV from the columns of the row-transformed image —
    the dwt_eaw97_2f_s convention (wH[]/wV[] out-params,
    /root/reference/src/eaw-experimental.h:33-48).
    """
    h, w_ = x.shape[-2], x.shape[-1]
    j = resolve_j(h, w_, level)
    coeffs = []
    wts = []
    ll = x
    for _ in range(j):
        lo, hi, wh = eaw_lift_fwd(ll, wavelet, alpha, axis=-1)
        row_t = jnp.concatenate([lo, hi], axis=-1)
        wv = eaw_weights(jnp.moveaxis(row_t, -2, -1), alpha)
        wv = jnp.moveaxis(wv, -1, -2)
        ll2, lh2, _ = eaw_lift_fwd(lo, wavelet, alpha, axis=-2,
                                   weights=wv[..., :, : lo.shape[-1]])
        hl2, hh2, _ = eaw_lift_fwd(hi, wavelet, alpha, axis=-2,
                                   weights=wv[..., :, lo.shape[-1] :])
        coeffs.append((hl2, lh2, hh2))
        wts.append((wh, wv))
        ll = ll2
    return [ll] + coeffs[::-1], wts[::-1]


def eaw_waverec2(coeffs, weights, wavelet="cdf97"):
    """Inverse of :func:`eaw_wavedec2` (dwt_eaw97_2i_s semantics)."""
    ll = coeffs[0]
    for (hl, lh, hh), (wh, wv) in zip(coeffs[1:], weights):
        cw = ll.shape[-1]
        lo = eaw_lift_inv(ll, lh, wv[..., :, :cw], wavelet, axis=-2)
        hi = eaw_lift_inv(hl, hh, wv[..., :, cw:], wavelet, axis=-2)
        ll = eaw_lift_inv(lo, hi, wh, wavelet, axis=-1)
    return ll
