"""Stationary (undecimated, à-trous) wavelet transform.

TPU-native analogue of /root/reference/src/swt.c: per level, the signal
is filtered with the analysis low/high filter bank upsampled by 2^level
(à-trous), with saturated (edge-clamp) borders — no decimation.

Where the reference hardcodes the CDF 9/7 and 5/3 filter taps
(/root/reference/src/swt.c:6-16), here the analysis filters are derived
once from the wavelet's own lifting steps (impulse responses of the
lifting transform), guaranteeing exact consistency with the DWT path;
tests check the derived taps against the reference's constants.

Also provides a full multi-level SWT and its inverse (the reference
ships only the per-level forward); the inverse averages the two
polyphase reconstructions per level, the standard ISWT recursion.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops.conv import convolve1
from libdwt_tpu.ops.lifting import lift_fwd, lift_inv

__all__ = ["analysis_filters", "swt_level", "swt1", "iswt1", "swt2", "iswt2"]


@functools.lru_cache(maxsize=None)
def _analysis_filters_np(name: str) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """(lowpass g, highpass h, g_center, h_center) derived from lifting.

    Columns of the transform matrix give the analysis taps: applying the
    forward lifting transform to an identity matrix of size N yields
    L[k, i] = weight of x[k] in low output i (likewise H for high).
    Taps are read off around the interior sample i0, avoiding borders.
    """
    wavelet = get_wavelet(name)
    n = 64
    eye = jnp.eye(n, dtype=jnp.float64)
    # jitted: one eager dispatch here would poison the process's
    # dispatch latency for its whole life (CLAUDE.md timing landmine)
    lo, hi = jax.jit(lambda e: lift_fwd(e, wavelet, axis=-1))(eye)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    i0 = n // 4

    def taps(col, a0):
        # col[k] = weight of x[k]; a0 = undecimated output position.
        # Reference convolution form: y[a] = sum_j g[j] x[a + gc - j]
        # (/root/reference/src/util.c:29-47), i.e. g[j] = col[a0 + gc - j]:
        # the taps are the reversed column, center at (len-1) - (a0 - k0).
        k = np.nonzero(np.abs(col) > 1e-12)[0]
        t = col[k[0] : k[-1] + 1]
        return t[::-1].copy(), (len(t) - 1) - (a0 - k[0])

    g, g_center = taps(lo[:, i0], 2 * i0)
    h, h_center = taps(hi[:, i0], 2 * i0 + 1)
    return g, h, g_center, h_center


def analysis_filters(wavelet) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Analysis (lowpass, highpass, lo_center, hi_center) FIR taps.

    For CDF 9/7 / 5/3 these match the constants hardcoded at
    /root/reference/src/swt.c:6-16 (centers = len//2).
    """
    return _analysis_filters_np(get_wavelet(wavelet).name)


def swt_level(
    x: jax.Array, wavelet="cdf97", level: int = 0, axis: int = -1
) -> Tuple[jax.Array, jax.Array]:
    """One level of forward SWT -> (approx, detail), same length as x.

    Semantics of swt_cdf97_f_ex_stride_s (/root/reference/src/swt.c:18-70):
    convolution with the filter bank upsampled by 2^level, saturated
    borders, centers at size/2.
    """
    g, h, gc, hc = analysis_filters(wavelet)
    up = 1 << level
    lo = convolve1(x, jnp.asarray(g, x.dtype), g_center=gc, upsample=up, axis=axis)
    hi = convolve1(x, jnp.asarray(h, x.dtype), g_center=hc, upsample=up, axis=axis)
    return lo, hi


def swt1(x, wavelet="cdf97", level: int = 1, axis: int = -1):
    """Multi-level 1-D SWT -> [A_J, D_J, ..., D_1] (all same length)."""
    details = []
    approx = x
    for j in range(level):
        approx, detail = swt_level(approx, wavelet, level=j, axis=axis)
        details.append(detail)
    return [approx] + details[::-1]


def _synthesis_pair(wavelet):
    """Per-level ISWT reconstruction: the two polyphase DWT inverses."""
    wavelet = get_wavelet(wavelet)

    def rec(a, d, axis):
        # à-trous grid: approx lives at even positions (s[i] = A[2i]),
        # detail at odd (d[i] = D[2i+1]) — see analysis_filters centers.
        a = jnp.moveaxis(a, axis, -1)
        d = jnp.moveaxis(d, axis, -1)
        e = lift_inv(a[..., 0::2], d[..., 1::2], wavelet, axis=-1)
        # odd phase: the DWT of x shifted by one sample
        d2 = jnp.roll(d, -1, axis=-1)
        o = lift_inv(a[..., 1::2], d2[..., 1::2], wavelet, axis=-1)
        o = jnp.roll(o, 1, axis=-1)
        out = 0.5 * (e + o)
        return jnp.moveaxis(out, -1, axis)

    return rec


def iswt1(coeffs, wavelet="cdf97", axis: int = -1):
    """Inverse multi-level 1-D SWT (standard shift-averaging recursion).

    The reference ships no inverse SWT; this is the classic ISWT: at
    level j the approx/detail pair is decimated at the 2^j phases, each
    phase inverted with the DWT inverse, and the shifted reconstructions
    averaged.  Needs the length divisible by 2^level (the phase
    decimation at the deepest level).
    """
    level = len(coeffs) - 1
    n = jnp.asarray(coeffs[0]).shape[axis]
    if n % (1 << level):
        raise ValueError(
            f"ISWT needs the transformed axis ({n}) divisible by "
            f"2^level ({1 << level})"
        )
    rec = _synthesis_pair(wavelet)
    approx = coeffs[0]
    level = len(coeffs) - 1
    for jidx, detail in enumerate(coeffs[1:]):
        j = level - 1 - jidx  # current dilation level
        step = 1 << j
        a = jnp.moveaxis(approx, axis, -1)
        d = jnp.moveaxis(detail, axis, -1)
        n = a.shape[-1]
        # process each of the 2^j interleaved sub-signals independently
        outs = jnp.zeros_like(a)
        for p in range(step):
            sub_a = a[..., p::step]
            sub_d = d[..., p::step]
            sub = rec(sub_a, sub_d, axis=-1)
            outs = outs.at[..., p::step].set(sub)
        approx = jnp.moveaxis(outs, -1, axis)
    return approx


def swt2(x, wavelet="cdf97", level: int = 1):
    """Multi-level 2-D SWT -> [A_J, (H_J, V_J, D_J), ..., (H_1, V_1, D_1)].

    Separable à-trous over the last two axes (rows then columns per
    level), all outputs image-sized.
    """
    bands = []
    approx = x
    for j in range(level):
        lo_x, hi_x = swt_level(approx, wavelet, level=j, axis=-1)
        ll, lh = swt_level(lo_x, wavelet, level=j, axis=-2)
        hl, hh = swt_level(hi_x, wavelet, level=j, axis=-2)
        approx = ll
        bands.append((hl, lh, hh))
    return [approx] + bands[::-1]


def iswt2(coeffs, wavelet="cdf97"):
    """Inverse multi-level 2-D SWT (phase-averaged separable recursion).
    Needs both image dims divisible by 2^level."""
    level0 = len(coeffs) - 1
    a0 = jnp.asarray(coeffs[0])
    if a0.shape[-1] % (1 << level0) or a0.shape[-2] % (1 << level0):
        raise ValueError(
            f"ISWT needs H, W ({a0.shape[-2]}, {a0.shape[-1]}) divisible "
            f"by 2^level ({1 << level0})"
        )
    rec = _synthesis_pair(wavelet)
    approx = coeffs[0]
    level = len(coeffs) - 1
    for jidx, (hl, lh, hh) in enumerate(coeffs[1:]):
        j = level - 1 - jidx
        step = 1 << j

        def rec_axis(a, d, axis):
            a = jnp.moveaxis(a, axis, -1)
            d = jnp.moveaxis(d, axis, -1)
            out = jnp.zeros_like(a)
            for p in range(step):
                out = out.at[..., p::step].set(
                    rec(a[..., p::step], d[..., p::step], axis=-1)
                )
            return jnp.moveaxis(out, -1, axis)

        lo_x = rec_axis(approx, lh, -2)
        hi_x = rec_axis(hl, hh, -2)
        approx = rec_axis(lo_x, hi_x, -1)
    return approx
