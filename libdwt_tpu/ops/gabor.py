"""Gabor / time-frequency analysis: STFT, complex-Morlet CWT, S-transform.

TPU-native analogue of /root/reference/src/gabor.c:
  * Gabor atom/function/wavelet and freq<->scale maps (:8-70);
  * per-bin complex kernel generation with the 4-sigma Gaussian window
    rule (gaussian_size/center, :70-93; gabor_gen_kernel :275-292;
    s_gen_kernel :330-360);
  * the TF plane drivers gabor_ft_s (:531), gabor_wt_s (:632),
    gabor_st_s (:702) and their _arg_ (phase) variants, with the plane
    row order low-frequency-at-bottom (row bins-1-y);
  * phase_derivative_s (:874) and the three ridge detectors (:911,955,1111);
  * the chirp test-signal generator test_signal (:390).

TPU re-design: the per-bin C loop of complex dot products
(cdot1_s, :105-160 — a zero-truncated centered correlation) becomes ONE
batched real conv: the ragged per-bin kernels are zero-padded into a
common-center (bins, K) bank, and XLA's conv_general_dilated computes
the whole TF plane in a single fused pass (zero-padded taps contribute
nothing, exactly reproducing the truncated overlap sum).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gabor_atom",
    "gabor_function",
    "gabor_wavelet",
    "gabor_freq",
    "gabor_scale",
    "gaussian_size",
    "gaussian_center",
    "gabor_ft",
    "gabor_wt",
    "gabor_st",
    "phase_derivative",
    "detect_ridges1",
    "detect_ridges2",
    "detect_ridges3",
    "strongest_ridges",
    "diff_points",
    "test_signal",
]


# ------------------------------------------------------------------ atoms


def gabor_atom(t, alpha: float, omega: float):
    """sqrt(alpha/pi) * exp(-alpha t^2) * exp(+i omega t)
    (/root/reference/src/gabor.c:8-21)."""
    t = np.asarray(t, np.float64)
    return (
        math.sqrt(alpha / math.pi)
        * np.exp(-alpha * t * t)
        * np.exp(1j * omega * t)
    )


def gabor_function(t, sigma: float, f: float):
    return gabor_atom(t, 1.0 / (2.0 * sigma * sigma), f)


def gabor_wavelet(t, sigma: float, f: float, a: float):
    """Scaled atom: (1/|a|) psi(t/a) (/root/reference/src/gabor.c:36-50)."""
    t = np.asarray(t, np.float64) / a
    return gabor_atom(t, 1.0 / (2.0 * sigma * sigma), f) / abs(a)


def gabor_freq(f: float, a: float) -> float:
    return f / a


def gabor_scale(f_c: float, f: float) -> float:
    return f_c / f


def gaussian_limit(sigma: float, a: float) -> float:
    return 4.0 * sigma * a  # "3-sigma rule" with 4 in the reference (:70-76)


def gaussian_size(sigma: float, a: float) -> int:
    return int(math.ceil(1.0 + 2.0 * gaussian_limit(sigma, a)))


def gaussian_center(sigma: float, a: float) -> int:
    return gaussian_size(sigma, a) // 2


# ----------------------------------------------------------- kernel banks


def _bank(kernels) -> Tuple[np.ndarray, int]:
    """Pack ragged (taps, center) kernels into a common-center bank."""
    left = max(c for _, c in kernels)
    right = max(len(t) - c for t, c in kernels)
    k = left + right
    bank = np.zeros((len(kernels), k), np.complex128)
    for b, (taps, c) in enumerate(kernels):
        bank[b, left - c : left - c + len(taps)] = taps
    return bank, left


def _tf_plane(sig: jax.Array, bank: np.ndarray, center: int) -> jax.Array:
    """Complex correlation responses for every bin in one conv pass.

    out[..., b, i] = sum_j sig_zeropad[..., i + j - center] * conj(bank[b, j])
    — the cdot1_s overlap sum (/root/reference/src/gabor.c:105-160) with
    out-of-range terms contributing zero.  Batched over leading axes.
    """
    sig = jnp.asarray(sig)
    lead = sig.shape[:-1]
    n = sig.shape[-1]
    k = bank.shape[-1]
    dt = sig.dtype
    flat = sig.reshape((-1, n))
    pads = [(0, 0)] * (flat.ndim - 1) + [(center, k - 1 - center)]
    xp = jnp.pad(flat, pads)[:, None, :]
    kern_re = jnp.asarray(np.real(bank), dt)[:, None, :]
    kern_im = jnp.asarray(np.imag(bank), dt)[:, None, :]
    dn = jax.lax.conv_dimension_numbers(xp.shape, kern_re.shape, ("NCH", "OIH", "NCH"))
    re = jax.lax.conv_general_dilated(xp, kern_re, (1,), "VALID", dimension_numbers=dn)
    im = jax.lax.conv_general_dilated(xp, kern_im, (1,), "VALID", dimension_numbers=dn)
    # conj(kern): re - i*im
    out = (re - 1j * im)[:, :, :n]
    return out.reshape(lead + out.shape[1:]) if lead else out[0]


def _plane_rows(resp: jax.Array, out: str):
    """Magnitude or phase, with the reference's bottom-up row order."""
    vals = jnp.abs(resp) if out == "mag" else jnp.angle(resp)
    return vals[..., ::-1, :].astype(jnp.float32)


def gabor_ft(sig, bins: int, sigma: float, out: str = "mag") -> jax.Array:
    """Gabor transform (STFT) TF plane, (bins, N).

    Bin y uses freq = y/bins * pi at scale 1 (gabor_ft_s,
    /root/reference/src/gabor.c:531-580); row bins-1-y of the plane.
    ``out``: 'mag' (timefreq_line) or 'arg' (timefreq_arg_line).
    """
    kernels = []
    for y in range(bins):
        freq = y / bins * math.pi
        size = gaussian_size(sigma, 1.0)
        c = gaussian_center(sigma, 1.0)
        kernels.append((gabor_wavelet(np.arange(size) - c, sigma, freq, 1.0), c))
    bank, center = _bank(kernels)
    return _plane_rows(_tf_plane(sig, bank, center), out)


def gabor_wt(sig, bins: int, sigma: float, freq: float, out: str = "mag") -> jax.Array:
    """Complex-Morlet CWT TF plane (gabor_wt_s,
    /root/reference/src/gabor.c:632-700): bin y analyses f = (y+1)/bins*pi
    via scale a = freq/f of the mother wavelet."""
    kernels = []
    for y in range(bins):
        f = (y + 1) / bins * math.pi
        a = gabor_scale(freq, f)
        size = gaussian_size(sigma, a)
        c = gaussian_center(sigma, a)
        kernels.append((gabor_wavelet(np.arange(size) - c, sigma, freq, a), c))
    bank, center = _bank(kernels)
    return _plane_rows(_tf_plane(sig, bank, center), out)


def s_sigma(f: float) -> float:
    return math.sqrt(1.0 / (2.0 * f * f))


def gabor_st(sig, bins: int, out: str = "mag") -> jax.Array:
    """Stockwell (S-)transform plane (gabor_st_s,
    /root/reference/src/gabor.c:702-760): bin y analyses f = (y+1)/bins*0.5
    cycles/sample with the frequency-dependent Gaussian alpha = f^2."""
    kernels = []
    for y in range(bins):
        f = (y + 1) / bins * 0.5
        alpha = f * f
        sigma = s_sigma(f)
        omega = 2.0 * math.pi * f
        size = gaussian_size(sigma, 1.0)
        c = gaussian_center(sigma, 1.0)
        kernels.append((gabor_atom(np.arange(size) - c, alpha, omega), c))
    bank, center = _bank(kernels)
    return _plane_rows(_tf_plane(sig, bank, center), out)


# -------------------------------------------------------- phase and ridges


def phase_derivative(angle: jax.Array, limit: float = math.pi) -> jax.Array:
    """Wrapped finite difference of phase along x, column 0 = 0
    (phase_derivative_s, /root/reference/src/gabor.c:874-909)."""
    angle = jnp.asarray(angle)
    d = angle[..., 1:] - angle[..., :-1]
    two_pi = 2.0 * math.pi
    d = d - two_pi * jnp.ceil((d - limit) / two_pi).clip(0)
    d = d + two_pi * jnp.ceil((-d - limit) / two_pi).clip(0)
    zero = jnp.zeros_like(angle[..., :1])
    return jnp.concatenate([zero, d], axis=-1)


def detect_ridges1(magnitude: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Horizontal local-maximum ridge detector
    (detect_ridges1_s, /root/reference/src/gabor.c:911-953):
    ridge where -(m[x-1]-m[x])*(m[x]-m[x+1]) > 0 and m > threshold;
    output value m/(2*pi)."""
    m = jnp.asarray(magnitude)
    left = m[..., :-2]
    mid = m[..., 1:-1]
    right = m[..., 2:]
    factor = -(left - mid) * (mid - right)
    hit = (factor > 0) & (mid > threshold)
    core = jnp.where(hit, mid / (2.0 * math.pi), 0.0)
    zero = jnp.zeros_like(m[..., :1])
    return jnp.concatenate([zero, core, zero], axis=-1)


def detect_ridges2(inst_freq: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Instantaneous-frequency sign detector (detect_ridges2_s,
    /root/reference/src/gabor.c:955-990): ridge where the phase
    derivative is negative with |.| > threshold; value |d|/(2*pi)."""
    d = jnp.asarray(inst_freq)
    hit = (d < 0) & (jnp.abs(d) > threshold)
    out = jnp.where(hit, jnp.abs(d) / (2.0 * math.pi), 0.0)
    out = out.at[..., 0].set(0.0).at[..., -1].set(0.0)
    return out


def detect_ridges3(magnitude: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Gradient-direction local-maximum detector (detect_ridges3_s,
    /root/reference/src/gabor.c:1111-1160): at each interior pixel,
    step one pixel in the quantized gradient direction; ridge where the
    value is >= that neighbour and > threshold."""
    m = jnp.asarray(magnitude)
    dx = (jnp.roll(m, -1, -1) - jnp.roll(m, 1, -1)) / 2.0
    dy = (jnp.roll(m, -1, -2) - jnp.roll(m, 1, -2)) / 2.0
    angle = jnp.arctan2(dy, dx)
    dirx = jnp.cos(angle)
    diry = jnp.sin(angle)
    nx = jnp.where(dirx < -0.5, -1, jnp.where(dirx > 0.5, 1, 0))
    ny = jnp.where(diry < -0.5, -1, jnp.where(diry > 0.5, 1, 0))
    h, w = m.shape[-2], m.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 1)
    ty = jnp.clip(yy + ny, 0, h - 1)
    tx = jnp.clip(xx + nx, 0, w - 1)
    # flat gather: composing two take_along_axis calls would sample ty
    # at the wrong column for batched inputs
    flat = (ty * w + tx).reshape(m.shape[:-2] + (h * w,))
    nxt = jnp.take_along_axis(
        m.reshape(m.shape[:-2] + (h * w,)), flat, axis=-1
    ).reshape(m.shape)
    hit = (m >= nxt) & (m > threshold)
    out = jnp.where(hit, m / (2.0 * math.pi), 0.0)
    interior = (
        (yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1)
    )
    return jnp.where(interior, out, 0.0)


# ------------------------------------------------------------ test signals


def test_signal(size: int, type: int = 0) -> np.ndarray:
    """Chirp/Gabor test signals (test_signal,
    /root/reference/src/gabor.c:390-529), types 0-3 and 7-8."""
    i = np.arange(size, dtype=np.float64)
    t = i / size
    out = np.zeros(size, np.float64)
    if type == 0:
        f0 = 1.0 / 3.0 * (size - 1) / 2.0
        f1 = 2.0 / 3.0 * (size - 1) / 2.0
        out += np.where(i < 2 * size // 3, np.cos(t * 2 * math.pi * f0), 0.0)
        out += np.where(i > 1 * size // 3, np.cos(t * 2 * math.pi * f1), 0.0)
    elif type == 1:
        f0 = 1.0 / 3.0 * (size - 1) / 2.0
        f1 = 2.0 / 3.0 * (size - 1) / 2.0
        out = np.where(
            i < size // 2,
            np.cos(t * 2 * math.pi * f0),
            np.cos(t * 2 * math.pi * f1),
        )
    elif type == 2:
        f = (size - 1) / 2.0
        out = np.cos(0.5 * t * t * 2 * math.pi * f)
    elif type == 3:
        f = (size - 1) / 4.0
        omega = 2 * math.pi * f
        out = np.cos(0.5 * t * t * omega) + np.cos(0.5 * t * t * omega + 0.4 * t * omega)
    elif type == 7:
        center = size // 2
        # size/8 is C INTEGER division in the reference (gabor.c:498)
        out = np.real(gabor_function(i - center, size // 8, 0.5))
    elif type == 8:
        c0, c1 = size // 4, 3 * size // 4
        out = np.real(gabor_function(i - c0, size // 16, 1.0)) + np.real(
            gabor_function(i - c1, size // 16, 2.0)
        )
    else:
        raise ValueError(f"unknown test signal type {type}")
    return out.astype(np.float32)


# -------------------------------------------------- blob/peak extraction


def strongest_ridges(plane: jax.Array, count: int,
                     threshold: float = 0.0) -> jax.Array:
    """Iteratively extract the ``count`` strongest ridge points of an
    S-transform magnitude plane (spectra_st_get_strongest_ridges,
    /root/reference/examples/spectra-blobs/spectra-experimental.c:120-180).

    Pipeline: ``detect_ridges1`` on the plane, then ``count`` rounds of
    global argmax -> record ``(x, y)`` -> damp the ridge image by
    ``1 - g`` where ``g`` is, per plane row, the S-atom Gaussian
    envelope of that row's analysis frequency (``sigma = s_sigma(f)``,
    4-sigma integer support, unit center) placed at the peak column —
    the matched suppression of ``get_maximum``/``remove_ridge``
    (spectra-experimental.c:27-118).  The plane stores low frequencies
    at the bottom (:func:`gabor_st` row ``bins-1-y`` holds bin ``y``),
    so plane row ``r`` analyses ``f = (bins-r)/bins*0.5`` — the same
    flip the reference applies by writing ``maxima`` at ``size_y-y-1``
    (spectra-experimental.c:98-101).

    Returns an ``(count, 2)`` int32 array of ``(x, y)`` positions,
    strongest first.  Jittable (one fori_loop; static plane shape).
    """
    plane = jnp.asarray(plane)
    if plane.ndim != 2:
        raise ValueError(f"expected a 2-D plane, got shape {plane.shape}")
    bins, n = plane.shape

    # static per-row suppression geometry (numpy; rows are few)
    rows = np.arange(bins)
    f = (bins - rows) / bins * 0.5
    sig = np.sqrt(1.0 / (2.0 * f * f))
    size = np.ceil(1.0 + 2.0 * 4.0 * sig).astype(np.int64)
    center = size // 2
    inv_two_sig2 = jnp.asarray((1.0 / (2.0 * sig * sig))[:, None],
                               plane.dtype)
    lo = jnp.asarray((-center)[:, None], jnp.int32)       # window start
    hi = jnp.asarray((size - 1 - center)[:, None], jnp.int32)  # window end

    ridges = detect_ridges1(plane, threshold)
    xx = jnp.arange(n, dtype=jnp.int32)[None, :]

    def body(i, carry):
        ridges, points = carry
        flat = jnp.argmax(ridges)
        py = (flat // n).astype(jnp.int32)
        px = (flat % n).astype(jnp.int32)
        points = points.at[i, 0].set(px).at[i, 1].set(py)
        d = xx - px
        g = jnp.exp(-(d.astype(ridges.dtype) ** 2) * inv_two_sig2)
        inside = (d >= lo) & (d <= hi)
        ridges = ridges * (1.0 - jnp.where(inside, g, 0.0))
        return ridges, points

    points0 = jnp.zeros((count, 2), jnp.int32)
    _, points = jax.lax.fori_loop(0, count, body, (ridges, points0))
    return points


def diff_points(reference: jax.Array, tested: jax.Array) -> jax.Array:
    """Per-reference-point distance to the nearest tested point
    (spectra_diff_points,
    /root/reference/examples/spectra-blobs/spectra-experimental.c:182-215).
    Both inputs are ``(k, 2)`` coordinate arrays; returns ``(k,)``."""
    ref = jnp.asarray(reference, jnp.float32)
    tst = jnp.asarray(tested, jnp.float32)
    d2 = jnp.sum((ref[:, None, :] - tst[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.min(d2, axis=1))
