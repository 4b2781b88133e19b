"""Fused single-loop 2-D DWT Pallas kernels (the TPU "single-loop core").

This is the TPU-native re-design of the reference's performance heart —
the fused single-loop cores with virtual symmetric border extension
(unified_4x4, /root/reference/src/dwt-sym.c:466-534, and the diagonal/
vertical core zoo of /root/reference/src/dwt-core.c).  Instead of SSE
registers with carried prolog/epilog state, each Pallas grid program
streams one full-width row strip of the image through VMEM and performs
BOTH the row and the column lifting passes in one residency:

  HBM -> VMEM strip (rows overlapped by a 4-sample halo via pl.Element
  windows, auto-pipelined) -> row lifting on lanes -> column lifting on
  sublanes -> merged scaling -> polyphase deinterleave -> four subband
  strips -> HBM.

Strips are full-width so the lane dimension needs no halo (Mosaic
requires lane-dim blocks of 128k or full width anyway); the only
overlap is 4 rows between vertically adjacent strips.  Inter-strip
lifting dependencies are resolved by those overlap reads (stateless
strips, the overlap trade of /root/reference/src/dwt.c's overlapped
single-loop variants) rather than carried state — a better fit for a
parallel pipelined grid.

Border semantics: whole-point symmetric extension, applied by host-side
mirror padding (the virt2real analogue, /root/reference/src/dwt-sym.c:434-450).

Lifting arithmetic runs on the *interleaved* layout (no polyphase split
until the final store): each step is

    t = where(parity, t + c * (roll(t,+1) + roll(t,-1)), t)

keeping every VPU op full-width and dense.  Float steps use libdwt's
float constants; integer steps use the exact ``(w*(l+r) + k) >> s``
arithmetic of /root/reference/src/core-int.c:38-43 and are bit-exact
against the separable oracle.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdwt_tpu.models.wavelets import Wavelet, get_wavelet

__all__ = [
    "fused_dwt2_level",
    "fused_dwt2_2level",
    "fused_idwt2_level",
    "fused_idwt2_2level",
    "fused_wavedec2",
    "fused_waverec2",
    "HALO",
]

#: one-sided halo (signal samples) sufficient for up to 4 lifting steps.
HALO = 4
#: channel-domain halo for the inverse kernel.  Correctness needs only
#: HALO/2 = 2, but Mosaic requires both the window size (hy + 2*CH) and
#: the window start (i*hy) to be 8-aligned, which forces CH = 4 with
#: hy % 8 == 0.
CH = 4

#: soft cap on VMEM working set per program (bytes); real budget ~16MB.
_VMEM_BUDGET = 10 * 1024 * 1024
#: target input-window bytes per strip (tunable; see _pick_strip_rows).
_STRIP_TARGET_BYTES = 1024 * 1024
#: largest image the deep-pyramid kernel holds in VMEM (536x1024 f32 =
#: 2.24MB verified compiling on v5e; ~6 live copies inside the 16MB limit).
_DEEP_VMEM_LIMIT = int(2.4 * 1024 * 1024)


# ------------------------------------------------------------ step algebra


def _parity_mask(shape, axis, want_odd):
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=axis)
    par = ids % 2
    return (par == 1) if want_odd else (par == 0)


def _lift_interleaved(t, wavelet: Wavelet, axis: int, inverse: bool):
    """All lifting steps of ``wavelet`` along ``axis`` on interleaved data."""
    is_int = jnp.issubdtype(t.dtype, jnp.integer)
    if is_int:
        steps = wavelet.int_steps
        if steps is None:
            raise ValueError(f"{wavelet.name}: no reversible integer path")
        if inverse:
            steps = steps[::-1]
        for st in steps:
            sign = -st.sign if inverse else st.sign
            nsum = jnp.roll(t, 1, axis) + jnp.roll(t, -1, axis)
            v = jax.lax.shift_right_arithmetic(
                st.w * nsum + st.k, jnp.asarray(st.shift, t.dtype)
            )
            upd = t + sign * v
            t = jnp.where(_parity_mask(t.shape, axis, st.target == "d"), upd, t)
    else:
        steps = wavelet.steps[::-1] if inverse else wavelet.steps
        sgn = -1.0 if inverse else 1.0
        for st in steps:
            if st.is_symmetric:
                c = jnp.asarray(sgn * st.coeff, t.dtype)
                delta = c * (jnp.roll(t, 1, axis) + jnp.roll(t, -1, axis))
            else:
                delta = jnp.asarray(sgn * st.left, t.dtype) * jnp.roll(t, 1, axis) \
                    + jnp.asarray(sgn * st.right, t.dtype) * jnp.roll(t, -1, axis)
            upd = t + delta
            t = jnp.where(_parity_mask(t.shape, axis, st.target == "d"), upd, t)
    return t


def _scale_interleaved(t, wavelet: Wavelet, inverse: bool):
    """Merged per-parity scaling over both axes (float only)."""
    if wavelet.scale_s is None or jnp.issubdtype(t.dtype, jnp.integer):
        return t
    if inverse:
        lo = wavelet.inv_scale_s if wavelet.inv_scale_s is not None else wavelet.scale_d
        hi = wavelet.inv_scale_d if wavelet.inv_scale_d is not None else wavelet.scale_s
    else:
        lo, hi = wavelet.scale_s, wavelet.scale_d
    lo = jnp.asarray(lo, t.dtype)
    hi = jnp.asarray(hi, t.dtype)
    fy = jnp.where(_parity_mask(t.shape, 0, False), lo, hi)
    fx = jnp.where(_parity_mask(t.shape, 1, False), lo, hi)
    return t * fy * fx


def fused_supported(wavelet) -> bool:
    """The fused kernels use whole-point mirror padding for borders,
    which equals the oracle's channel-clamp rules only for wavelets with
    symmetric lifting steps (CDF families) or steps that never cross a
    block edge (Haar).  Asymmetric-step wavelets (D4) differ at image
    borders and must use the separable oracle."""
    wavelet = get_wavelet(wavelet)
    return wavelet.name == "haar" or all(st.is_symmetric for st in wavelet.steps)


def _check_fused_supported(wavelet):
    if not fused_supported(wavelet):
        raise ValueError(
            f"wavelet {wavelet.name!r} has asymmetric lifting steps; its "
            "border semantics need the separable path (impl='separable')"
        )


# ----------------------------------------------------------- size helpers


def _even(n: int) -> int:
    return n + (n % 2)


def _pick_strip_rows(wc: int, itemsize: int, inverse: bool) -> int:
    """Strip height targeting a ~1 MB input window (multiple of 16 so
    the half-resolution blocks stay 8-aligned).

    Empirically on v5e, many small strips beat few large ones — the
    grid pipeline overlaps DMA with compute better (64-row strips on a
    4K frame reach ~1 TB/s effective vs ~0.96 TB/s at 512 rows) — as
    long as the strip amortizes the halo (ty >> 2*HALO).  The VMEM
    budget only binds for very wide images.
    """
    bytes_per_row = (wc + 2 * HALO) * itemsize
    target = _STRIP_TARGET_BYTES
    cap = _VMEM_BUDGET // ((6 if inverse else 5) * bytes_per_row)
    ty = min(target // bytes_per_row, cap)
    ty = max(16, min(512, (ty // 16) * 16))
    return ty


# ----------------------------------------------- sublane (de)interleaving
#
# Mosaic supports polyphase packing ops only on the sublane axis (strided
# lane slices lower to unsupported gathers); lane-axis polyphase is done
# by sandwiching a transpose, which the TPU handles natively.


def _deint_sub(v):
    """Split even/odd SUBLANES: (2n, c) -> two (n, c) arrays."""
    n = v.shape[0] // 2
    w = v.reshape(n, 2, v.shape[1])
    return w[:, 0, :], w[:, 1, :]


def _int_sub(a, b):
    """Interleave along sublanes: c[2i]=a[i], c[2i+1]=b[i]."""
    even = _parity_mask((2 * a.shape[0], a.shape[1]), 0, False)
    return jnp.where(even, jnp.repeat(a, 2, axis=0), jnp.repeat(b, 2, axis=0))


# ---------------------------------------------------------- forward kernel


def _fwd_kernel(x_ref, ll_ref, hl_ref, lh_ref, hh_ref, *, wavelet, ty, wc):
    t = x_ref[:]
    # rows first, then columns — the reference's axis order
    # (/root/reference/src/libdwt.c:12829-12894).
    t = _lift_interleaved(t, wavelet, axis=1, inverse=False)
    t = _lift_interleaved(t, wavelet, axis=0, inverse=False)
    t = _scale_interleaved(t, wavelet, inverse=False)
    v = t[HALO : HALO + ty, HALO : HALO + wc]
    a, b = _deint_sub(v)  # even / odd rows, (ty/2, wc)
    llT, hlT = _deint_sub(a.T)  # lane polyphase via transpose sandwich
    lhT, hhT = _deint_sub(b.T)
    ll_ref[:] = llT.T
    hl_ref[:] = hlT.T
    lh_ref[:] = lhT.T
    hh_ref[:] = hhT.T


@functools.partial(jax.jit, static_argnames=("wavelet", "strip_rows", "interpret", "boundary_rows"))
def fused_dwt2_level(
    x: jax.Array,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    boundary_rows: str = "mirror",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-level fused 2-D forward DWT -> (LL, HL, LH, HH).

    Semantics identical to :func:`libdwt_tpu.dwt2_level` (the separable
    oracle); float results agree to FP-association tolerance, integer
    results bit-exactly.  Requires min(H, W) > HALO.

    ``boundary_rows='extended'`` means the caller already supplied HALO
    valid rows above and below the image (x has h+2*HALO rows, h even)
    — the sharded path's halo-exchange case — so no row mirror is
    applied; columns still mirror.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if x.ndim != 2:
        raise ValueError("fused_dwt2_level takes one 2-D image; vmap/loop batches")
    if boundary_rows not in ("mirror", "extended"):
        raise ValueError("boundary_rows must be 'mirror' or 'extended'")
    if boundary_rows == "extended":
        h = x.shape[0] - 2 * HALO
        w = x.shape[1]
        if h % 2:
            raise ValueError("extended mode needs an even row count")
    else:
        h, w = x.shape
    if min(h, w) <= HALO:
        raise ValueError("image too small for the fused kernel; use the oracle")

    wc = _even(w)
    he = _even(h)
    ty = strip_rows or _pick_strip_rows(wc, x.dtype.itemsize, inverse=False)
    # multi-strip: window ty+8 and out block ty/2 must be 8-aligned -> ty % 16 == 0;
    # single strip: full-dimension blocks are exempt from alignment.
    ty = max(16, (ty // 16) * 16)
    if he <= ty:
        ty = he
    ny = pl.cdiv(he, ty)

    # mirror by HALO (rows only when not caller-extended), zero-align
    # rows to the strip grid and columns to even width.
    if boundary_rows == "extended":
        xp = jnp.pad(x, ((0, 0), (HALO, HALO)), mode="reflect")
    else:
        xp = jnp.pad(x, ((HALO, HALO), (HALO, HALO)), mode="reflect")
    xp = jnp.pad(
        xp,
        ((0, ny * ty + 2 * HALO - xp.shape[0]), (0, wc + 2 * HALO - xp.shape[1])),
    )

    hy, hx = ty // 2, wc // 2
    out_sd = jax.ShapeDtypeStruct((ny * hy, hx), x.dtype)
    out_spec = pl.BlockSpec((hy, hx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, wavelet=wavelet, ty=ty, wc=wc)
    ll, hl, lh, hh = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(ty + 2 * HALO, (0, 0)), pl.Element(wc + 2 * HALO, (0, 0))),
                lambda i: (pl.multiple_of(i * ty, 8), 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(out_sd, out_sd, out_sd, out_sd),
        interpret=interpret,
    )(xp)

    cy, cx = -(-h // 2), -(-w // 2)
    fy, fx = h // 2, w // 2
    return ll[:cy, :cx], hl[:cy, :fx], lh[:fy, :cx], hh[:fy, :fx]


# ----------------------------------------------- multi-scale fused kernel


#: halo for the two-level kernel: level-1 outputs need +-4 LL samples
#: (+-8 signal) on top of level 0's +-4.
HALO2 = 12


def _lift_level(t, wavelet):
    """One full 2-D lifting level on an interleaved tile."""
    t = _lift_interleaved(t, wavelet, axis=1, inverse=False)
    t = _lift_interleaved(t, wavelet, axis=0, inverse=False)
    return _scale_interleaved(t, wavelet, inverse=False)


def _split_bands(t):
    """Polyphase split of an interleaved tile -> (ll, hl, lh, hh)."""
    a, b = _deint_sub(t)
    llT, hlT = _deint_sub(a.T)
    lhT, hhT = _deint_sub(b.T)
    return llT.T, hlT.T, lhT.T, hhT.T


def _mirror_tail_sub(a, edge: int, count: int):
    """Whole-point mirror of sublanes past ``edge``: rows edge+1..edge+count
    become rows edge-1..edge-count; anything beyond is zeroed.  Static
    slices + concat only (no reversal primitive needed)."""
    L = a.shape[0]
    parts = [a[: edge + 1]]
    for m in range(1, count + 1):
        parts.append(a[edge - m : edge - m + 1])
    used = edge + 1 + count
    if used < L:
        parts.append(jnp.zeros((L - used,) + a.shape[1:], a.dtype))
    return jnp.concatenate(parts, axis=0)


def _2lvl_kernel(x_ref, ll2_ref, hl2_ref, lh2_ref, hh2_ref,
                 hl1_ref, lh1_ref, hh1_ref, *, wavelet, ty, wc, er, ny):
    t = x_ref[:]
    # ---- level 0 over the whole window (ty+24, wc+24)
    t = _lift_level(t, wavelet)
    c = HALO2 // 2  # 6 channel-domain halo
    a, b = _deint_sub(t)
    llT, hlT = _deint_sub(a.T)
    lhT, hhT = _deint_sub(b.T)
    hl1_ref[:] = hlT.T[c : c + ty // 2, c : c + wc // 2]
    lh1_ref[:] = lhT.T[c : c + ty // 2, c : c + wc // 2]
    hh1_ref[:] = hhT.T[c : c + ty // 2, c : c + wc // 2]

    # ---- level-1 border fixup: the signal-domain bottom/right mirror
    # induces a HALF-point mirror on the low channel (s[N+m] = s[N-1-m]),
    # but the oracle extends the level-1 input whole-point around its
    # last sample (s[N-1+m] = s[N-1-m]).  Rewrite the LL halo past the
    # image edge with the whole-point mirror.  The top/left halos need
    # no fix (x[-k] = x[k] already induces s[-m] = s[m]).
    ex = wc // 2 + c - 1  # window-lane coord of the last valid LL column
    llT = _mirror_tail_sub(llT, ex, c)  # right edge: every strip
    ll = llT.T
    fixed = _mirror_tail_sub(ll, er, c)  # bottom edge: last strip only
    is_last = pl.program_id(0) == ny - 1
    ll = jnp.where(is_last, fixed, ll)

    # ---- level 1 on the LL window (its 6-sample halo absorbs the
    # 4-sample lifting contamination + level-0's 2 invalid edge rows)
    t2 = _lift_level(ll, wavelet)
    ll2, hl2, lh2, hh2 = _split_bands(t2)  # (ty/4+6, wc/4+6)
    c2 = c // 2  # 3
    ll2_ref[:] = ll2[c2 : c2 + ty // 4, c2 : c2 + wc // 4]
    hl2_ref[:] = hl2[c2 : c2 + ty // 4, c2 : c2 + wc // 4]
    lh2_ref[:] = lh2[c2 : c2 + ty // 4, c2 : c2 + wc // 4]
    hh2_ref[:] = hh2[c2 : c2 + ty // 4, c2 : c2 + wc // 4]


@functools.partial(jax.jit, static_argnames=("wavelet", "strip_rows", "interpret"))
def fused_dwt2_2level(
    x: jax.Array,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
):
    """TWO decomposition levels in one pass over the image — the
    multi-scale fused single-loop of /root/reference/src/dwt-sym-ms.c
    (ms_cdf97_2f_dl_4x4_fused_s, dwt-sym-ms.h:24-50) re-designed for
    VMEM strips: each pixel is read from HBM once for both levels,
    cutting pyramid traffic ~25%.

    Returns (LL2, (HL2, LH2, HH2), (HL1, LH1, HH1)).  Requires
    h % 4 == 0, w % 4 == 0 and a symmetric-step wavelet.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    h, w = x.shape
    if h % 4 or w % 4:
        raise ValueError("fused_dwt2_2level needs h, w divisible by 4")
    if min(h, w) < 2 * HALO2:
        raise ValueError("image too small for the 2-level fused kernel")

    wc = w
    bytes_per_row = (wc + 2 * HALO2) * x.dtype.itemsize
    # ~64-row strips win on v5e for 4K frames (85us vs 114us at 96+
    # rows): more strips pipeline the DMA better — but never below 64,
    # where the 24-row halo share starts dominating the reads.
    ty = strip_rows or max(
        64, min(512, ((1024 * 1024 // bytes_per_row) // 32) * 32)
    )
    # multi-strip alignment: window start i*ty and size ty+24 are 8-aligned
    # for ty % 32 == 0; out blocks ty/2 and ty/4 are 8-aligned too.
    if h <= ty:
        ty = h
        if ty % 4:
            raise ValueError("unreachable: h % 4 checked above")
    ny = pl.cdiv(h, ty)

    xp = jnp.pad(x, ((HALO2, HALO2), (HALO2, HALO2)), mode="reflect")
    xp = jnp.pad(
        xp,
        ((0, ny * ty + 2 * HALO2 - xp.shape[0]), (0, 0)),
    )

    q2y, q2x = ty // 2, wc // 2
    q4y, q4x = ty // 4, wc // 4
    sd2 = jax.ShapeDtypeStruct((ny * q2y, q2x), x.dtype)
    sd4 = jax.ShapeDtypeStruct((ny * q4y, q4x), x.dtype)
    spec2 = pl.BlockSpec((q2y, q2x), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((q4y, q4x), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # window-row coord of the image's last LL row within the LAST strip
    er = h // 2 - 1 - (ny - 1) * (ty // 2) + HALO2 // 2
    kernel = functools.partial(
        _2lvl_kernel, wavelet=wavelet, ty=ty, wc=wc, er=er, ny=ny
    )
    ll2, hl2, lh2, hh2, hl1, lh1, hh1 = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(ty + 2 * HALO2, (0, 0)), pl.Element(wc + 2 * HALO2, (0, 0))),
                lambda i: (pl.multiple_of(i * ty, 8), 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(spec4, spec4, spec4, spec4, spec2, spec2, spec2),
        out_shape=(sd4, sd4, sd4, sd4, sd2, sd2, sd2),
        interpret=interpret,
    )(xp)
    hy, hx = h // 2, w // 2
    qy, qx = h // 4, w // 4
    return (
        ll2[:qy, :qx],
        (hl2[:qy, :qx], lh2[:qy, :qx], hh2[:qy, :qx]),
        (hl1[:hy, :hx], lh1[:hy, :hx], hh1[:hy, :hx]),
    )


def fused_wavedec2(x, wavelet="cdf97", level: int = 1, interpret: bool = False):
    """Multi-level MRA using the 2-level fused kernel where geometry
    allows, the single-level fused kernel otherwise, and the separable
    oracle for small residual levels.  Same pytree as wavedec2."""
    from libdwt_tpu.ops.separable import dwt2_level

    coeffs = []
    ll = x
    remaining = level
    # Below this edge length XLA's fused separable code wins: the level
    # is latency-bound, and one big XLA program beats extra Pallas
    # launches (measured on v5e: 2lvl+separable-rest 75us vs
    # 2lvl+2lvl+separable 136us on a 4K J=5 pyramid).
    min_fused = 1024
    while remaining > 0:
        h, w = ll.shape[-2], ll.shape[-1]
        if (
            remaining >= 2
            and h % 4 == 0
            and w % 4 == 0
            and min(h, w) >= min_fused
            and ll.ndim == 2
        ):
            ll, b2, b1 = fused_dwt2_2level(ll, wavelet, interpret=interpret)
            coeffs.append(b1)
            coeffs.append(b2)
            remaining -= 2
        elif min(h, w) >= min_fused and ll.ndim == 2 and fused_supported(wavelet):
            ll, hl, lh, hh = fused_dwt2_level(ll, wavelet, interpret=interpret)
            coeffs.append((hl, lh, hh))
            remaining -= 1
        elif (
            remaining >= 2
            and ll.ndim == 2
            and fused_supported(wavelet)
            and (h + 8) * (w + 8) * ll.dtype.itemsize <= _DEEP_VMEM_LIMIT
            and min(h, w) >> (remaining - 1) > 2 * HALO
        ):
            # pyramid tail: all remaining levels in one VMEM-resident launch
            deep = fused_deep_wavedec2(ll, wavelet, remaining, interpret=interpret)
            ll = deep[0]
            coeffs.extend(deep[:0:-1])  # fine-first into the accumulator
            remaining = 0
        else:
            ll, hl, lh, hh = dwt2_level(ll, wavelet)
            coeffs.append((hl, lh, hh))
            remaining -= 1
    return [ll] + coeffs[::-1]


# ---------------------------------------------------------- inverse kernel


def _inv_kernel(ll_ref, hl_ref, lh_ref, hh_ref, out_ref, *, wavelet, ty, wc):
    # lane interleave via the transpose sandwich, then sublane interleave
    row0 = _int_sub(ll_ref[:].T, hl_ref[:].T).T
    row1 = _int_sub(lh_ref[:].T, hh_ref[:].T).T
    t = _int_sub(row0, row1)
    t = _scale_interleaved(t, wavelet, inverse=True)
    # inverse axis order: columns first, then rows
    t = _lift_interleaved(t, wavelet, axis=0, inverse=True)
    t = _lift_interleaved(t, wavelet, axis=1, inverse=True)
    out_ref[:] = t[2 * CH : 2 * CH + ty, 2 * CH : 2 * CH + wc]


def _pad_channel_mirror(c, n: int, is_low: bool, axis: int):
    """Extend a polyphase channel with the channel-domain whole-point
    mirror (derived from x[-k]=x[k] and x[n-1+k]=x[n-1-k] with
    s[i]=x[2i], d[i]=x[2i+1]):

      top (any n):        s[-m] = s[m]          d[-m] = d[m-1]
      bottom (n even):    s[Ns+m] = s[Ns-1-m]   d[Nh+m] = d[Nh-2-m]
      bottom (n odd):     s[Ns+m] = s[Ns-2-m]   d[Nh+m] = d[Nh-1-m]

    Adds CH samples on top.  On the bottom the high channel of an odd
    length also receives its missing ceil-grid sample, so both channels
    leave with ceil(n/2) + 2*CH samples.
    """
    c = jnp.moveaxis(c, axis, 0)
    odd = n % 2 == 1
    top = c[1 : CH + 1][::-1] if is_low else c[0:CH][::-1]
    flip = c[::-1]
    if is_low:
        start, count = (1 if odd else 0), CH
    else:
        start, count = (0 if odd else 1), CH + (1 if odd else 0)
    bot = flip[start : start + count]
    out = jnp.concatenate([top, c, bot], axis=0)
    return jnp.moveaxis(out, 0, axis)


@functools.partial(jax.jit, static_argnames=("wavelet", "strip_rows", "interpret"))
def fused_idwt2_level(
    ll, hl, lh, hh,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Single-level fused 2-D inverse DWT (inverse of fused_dwt2_level)."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    cy, cx = ll.shape[-2], ll.shape[-1]
    fy, fx = hh.shape[-2], hh.shape[-1]
    h, w = cy + fy, cx + fx
    if min(h, w) < 2 * (CH + 1):  # channel mirror needs CH+1 samples
        raise ValueError("image too small for the fused kernel; use the oracle")
    wc = _even(w)
    he = _even(h)
    ty = strip_rows or _pick_strip_rows(wc, ll.dtype.itemsize, inverse=True)
    # multi-strip: channel window start i*hy and size hy + 2*CH must be
    # 8-aligned -> hy % 8 == 0 -> ty % 16 == 0 (with CH = 4);
    # single strip: full-dimension blocks are exempt.
    ty = max(16, (ty // 16) * 16)
    if he <= ty:
        ty = he
    ny = pl.cdiv(he, ty)
    hy, hx = ty // 2, wc // 2

    def prep(band, low_y, low_x):
        band = _pad_channel_mirror(band, h, low_y, axis=0)
        band = _pad_channel_mirror(band, w, low_x, axis=1)
        return jnp.pad(
            band,
            (
                (0, ny * hy + 2 * CH - band.shape[0]),
                (0, hx + 2 * CH - band.shape[1]),
            ),
        )

    llp = prep(ll, True, True)
    hlp = prep(hl, True, False)
    lhp = prep(lh, False, True)
    hhp = prep(hh, False, False)

    out_sd = jax.ShapeDtypeStruct((ny * ty, wc), ll.dtype)
    kernel = functools.partial(_inv_kernel, wavelet=wavelet, ty=ty, wc=wc)
    in_spec = pl.BlockSpec(
        (pl.Element(hy + 2 * CH, (0, 0)), pl.Element(hx + 2 * CH, (0, 0))),
        lambda i: (pl.multiple_of(i * hy, 8), 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[in_spec] * 4,
        out_specs=pl.BlockSpec((ty, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_sd,
        interpret=interpret,
    )(llp, hlp, lhp, hhp)
    return out[:h, :w]


# ------------------------------------------- multi-scale inverse kernel


def _mirror_tail_sub_repeat(a, edge: int, count: int):
    """Repeat-mirror of sublanes past ``edge``: ext[edge+1+m] = a[edge-m]
    (the oracle's even-length bottom rule s[Ns+m] = s[Ns-1-m])."""
    L = a.shape[0]
    parts = [a[: edge + 1]]
    for m in range(count):
        parts.append(a[edge - m : edge - m + 1])
    used = edge + 1 + count
    if used < L:
        parts.append(jnp.zeros((L - used,) + a.shape[1:], a.dtype))
    return jnp.concatenate(parts, axis=0)


def _inv2_kernel(ll2_ref, hl2_ref, lh2_ref, hh2_ref,
                 hl1_ref, lh1_ref, hh1_ref, out_ref,
                 *, wavelet, ty, wc, er1, ex1, ny):
    # ---- level-2 inverse on the quarter-resolution windows
    row0 = _int_sub(ll2_ref[:].T, hl2_ref[:].T).T
    row1 = _int_sub(lh2_ref[:].T, hh2_ref[:].T).T
    t2 = _int_sub(row0, row1)  # (ty/2+16, wc/2+16)
    t2 = _scale_interleaved(t2, wavelet, inverse=True)
    t2 = _lift_interleaved(t2, wavelet, axis=0, inverse=True)
    t2 = _lift_interleaved(t2, wavelet, axis=1, inverse=True)
    hy, hx = ty // 2, wc // 2
    ll1 = t2[CH : CH + hy + 2 * CH, CH : CH + hx + 2 * CH]

    # ---- border fixup: the reconstruction extends LL1 with the signal
    # whole-point mirror (skip), but the level-0 inverse oracle extends
    # its low channel with the repeat mirror at even-length bottom/right
    # edges.  Rewrite the halo past the image edge accordingly; top/left
    # agree already (s[-m] = s[m] both ways).
    ll1T = _mirror_tail_sub_repeat(ll1.T, ex1, CH).T  # right edge: all strips
    fixed = _mirror_tail_sub_repeat(ll1T, er1, CH)  # bottom edge: last strip
    ll1 = jnp.where(pl.program_id(0) == ny - 1, fixed, ll1T)

    # ---- level-0 inverse
    row0 = _int_sub(ll1.T, hl1_ref[:].T).T
    row1 = _int_sub(lh1_ref[:].T, hh1_ref[:].T).T
    t1 = _int_sub(row0, row1)  # (ty+16, wc+16)
    t1 = _scale_interleaved(t1, wavelet, inverse=True)
    t1 = _lift_interleaved(t1, wavelet, axis=0, inverse=True)
    t1 = _lift_interleaved(t1, wavelet, axis=1, inverse=True)
    out_ref[:] = t1[2 * CH : 2 * CH + ty, 2 * CH : 2 * CH + wc]


@functools.partial(jax.jit, static_argnames=("wavelet", "strip_rows", "interpret"))
def fused_idwt2_2level(
    ll2, bands2, bands1,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
):
    """TWO reconstruction levels in one pass — the inverse of
    :func:`fused_dwt2_2level` (multi-scale fused reconstruction, the
    dwt-sym-ms.c idea in the synthesis direction).  Takes
    (LL2, (HL2, LH2, HH2), (HL1, LH1, HH1)); requires h, w divisible
    by 4 and a symmetric-step wavelet.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    hl2, lh2, hh2 = bands2
    hl1, lh1, hh1 = bands1
    h = hl1.shape[-2] + lh1.shape[-2]
    w = hl1.shape[-1] + lh1.shape[-1]
    if h % 4 or w % 4:
        raise ValueError("fused_idwt2_2level needs h, w divisible by 4")
    if min(h, w) < 4 * (CH + 1):
        raise ValueError("image too small for the 2-level fused inverse")
    wc = w
    qrow_bytes = (wc // 4 + 2 * CH) * ll2.dtype.itemsize
    ty = strip_rows or max(
        64, min(512, ((1024 * 1024 * 4 // (5 * qrow_bytes)) // 32) * 32)
    )
    ty = min(ty, max(32, (h // 32) * 32))
    if h <= ty:
        ty = h
    if ty % 32 and h > ty:
        raise ValueError("strip_rows must be a multiple of 32")
    ny = pl.cdiv(h, ty)
    hy, hx = ty // 2, wc // 2
    qy, qx = ty // 4, wc // 4

    def prep(band, n_y, n_x, low_y, low_x, block_y, lanes):
        b = _pad_channel_mirror(band, n_y, low_y, axis=-2)
        b = _pad_channel_mirror(b, n_x, low_x, axis=-1)
        return jnp.pad(
            b,
            (
                (0, ny * block_y + 2 * CH - b.shape[-2]),
                (0, lanes + 2 * CH - b.shape[-1]),
            ),
        )

    # level-2 channels live on the (h/2, w/2) grid of LL1
    ll2p = prep(ll2, h // 2, w // 2, True, True, qy, qx)
    hl2p = prep(hl2, h // 2, w // 2, True, False, qy, qx)
    lh2p = prep(lh2, h // 2, w // 2, False, True, qy, qx)
    hh2p = prep(hh2, h // 2, w // 2, False, False, qy, qx)
    # level-1 channels live on the (h, w) grid
    hl1p = prep(hl1, h, w, True, False, hy, hx)
    lh1p = prep(lh1, h, w, False, True, hy, hx)
    hh1p = prep(hh1, h, w, False, False, hy, hx)

    er1 = h // 2 - 1 - (ny - 1) * hy + CH  # window-row of last valid LL1 row
    ex1 = wc // 2 - 1 + CH  # window-lane of last valid LL1 column
    out_sd = jax.ShapeDtypeStruct((ny * ty, wc), ll2.dtype)
    spec_q = pl.BlockSpec(
        (pl.Element(qy + 2 * CH, (0, 0)), pl.Element(qx + 2 * CH, (0, 0))),
        lambda i: (pl.multiple_of(i * qy, 8), 0),
        memory_space=pltpu.VMEM,
    )
    spec_h = pl.BlockSpec(
        (pl.Element(hy + 2 * CH, (0, 0)), pl.Element(hx + 2 * CH, (0, 0))),
        lambda i: (pl.multiple_of(i * hy, 8), 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _inv2_kernel, wavelet=wavelet, ty=ty, wc=wc, er1=er1, ex1=ex1, ny=ny
    )
    out = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[spec_q] * 4 + [spec_h] * 3,
        out_specs=pl.BlockSpec((ty, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_sd,
        interpret=interpret,
    )(ll2p, hl2p, lh2p, hh2p, hl1p, lh1p, hh1p)
    return out[:h, :w]


def fused_waverec2(coeffs, wavelet="cdf97", interpret: bool = False):
    """Multi-level reconstruction using the 2-level fused inverse where
    geometry allows, the separable oracle otherwise.  Inverse of
    :func:`fused_wavedec2` / wavedec2."""
    from libdwt_tpu.ops.separable import idwt2_level

    ll = coeffs[0]
    rest = list(coeffs[1:])
    min_fused = 1024
    while rest:
        h2 = rest[0][0].shape[-2] + rest[0][1].shape[-2]
        w2 = rest[0][0].shape[-1] + rest[0][1].shape[-1]
        if (
            len(rest) >= 2
            and ll.ndim == 2
            and fused_supported(wavelet)
            and h2 % 2 == 0 and w2 % 2 == 0
        ):
            # peek one level further: the 2-level inverse consumes two
            h1 = rest[1][0].shape[-2] + rest[1][1].shape[-2]
            w1 = rest[1][0].shape[-1] + rest[1][1].shape[-1]
            if min(h1, w1) >= min_fused and h1 % 4 == 0 and w1 % 4 == 0 \
                    and h1 == 2 * h2 and w1 == 2 * w2:
                ll = fused_idwt2_2level(
                    ll, rest[0], rest[1], wavelet, interpret=interpret
                )
                rest = rest[2:]
                continue
        ll = idwt2_level(ll, *rest[0], wavelet)
        rest = rest[1:]
    return ll


# ------------------------------------------------- deep-pyramid kernel


def _mirror_ext2(t, pad: int):
    """Whole-point mirror extension by ``pad`` on both axes, built from
    static single-row/column slices (no reverse primitive)."""
    top = jnp.concatenate([t[m : m + 1] for m in range(pad, 0, -1)], axis=0)
    bot = jnp.concatenate(
        [t[-1 - m : -m if m else None] for m in range(1, pad + 1)], axis=0
    )
    t = jnp.concatenate([top, t, bot], axis=0)
    tt = t.T
    left = jnp.concatenate([tt[m : m + 1] for m in range(pad, 0, -1)], axis=0)
    right = jnp.concatenate(
        [tt[-1 - m : -m if m else None] for m in range(1, pad + 1)], axis=0
    )
    return jnp.concatenate([left, tt, right], axis=0).T


def _deep_kernel(x_ref, *out_refs, wavelet, levels, h, w):
    cur = x_ref[:]
    refs = list(out_refs)
    ch, cw = h, w
    for _ in range(levels):
        ext = _mirror_ext2(cur[:ch, :cw] if (ch, cw) != cur.shape else cur, HALO)
        ext = _lift_interleaved(ext, wavelet, axis=1, inverse=False)
        ext = _lift_interleaved(ext, wavelet, axis=0, inverse=False)
        ext = _scale_interleaved(ext, wavelet, inverse=False)
        che, cwe = ch + ch % 2, cw + cw % 2  # odd: one extra mirror sample
        v = ext[HALO : HALO + che, HALO : HALO + cwe]
        a, b = _deint_sub(v)
        llT, hlT = _deint_sub(a.T)
        lhT, hhT = _deint_sub(b.T)
        cy, cx = -(-ch // 2), -(-cw // 2)
        fy, fx = ch // 2, cw // 2
        hl_ref, lh_ref, hh_ref = refs.pop(0), refs.pop(0), refs.pop(0)
        hl_ref[:] = hlT.T[:cy, :fx]
        lh_ref[:] = lhT.T[:fy, :cx]
        hh_ref[:] = hhT.T[:fy, :fx]
        cur = llT.T[:cy, :cx]
        ch, cw = cy, cx
    refs.pop(0)[:] = cur


@functools.partial(jax.jit, static_argnames=("wavelet", "levels", "interpret"))
def fused_deep_wavedec2(
    x: jax.Array,
    wavelet="cdf97",
    levels: int = 1,
    interpret: bool = False,
):
    """ALL remaining pyramid levels in ONE kernel launch with the whole
    image resident in VMEM — the tail-of-pyramid companion to the
    strip kernels (per-level HBM round trips and launches disappear;
    the deep levels are latency-bound, not bandwidth-bound).

    Requires (h+8)*(w+8)*itemsize small enough for several VMEM copies;
    callers fall back to the separable oracle otherwise.  Returns the
    wavedec2 pytree.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if x.ndim != 2:
        raise ValueError("fused_deep_wavedec2 takes one 2-D image")
    h, w = x.shape
    if (h + 8) * (w + 8) * x.dtype.itemsize > _DEEP_VMEM_LIMIT:
        raise ValueError("image too large to hold the deep pyramid in VMEM")
    if min(h, w) >> (levels - 1) <= 2 * HALO:
        raise ValueError("too many levels for this size; reduce or use oracle")

    shapes = []
    ch, cw = h, w
    for _ in range(levels):
        cy, cx = -(-ch // 2), -(-cw // 2)
        fy, fx = ch // 2, cw // 2
        shapes.append(((cy, fx), (fy, cx), (fy, fx)))  # hl, lh, hh
        ch, cw = cy, cx
    out_sd = []
    for (hs, ls, hhs) in shapes:
        out_sd += [
            jax.ShapeDtypeStruct(hs, x.dtype),
            jax.ShapeDtypeStruct(ls, x.dtype),
            jax.ShapeDtypeStruct(hhs, x.dtype),
        ]
    out_sd.append(jax.ShapeDtypeStruct((ch, cw), x.dtype))

    kernel = functools.partial(
        _deep_kernel, wavelet=wavelet, levels=levels, h=h, w=w
    )
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[spec],
        out_specs=tuple([spec] * len(out_sd)),
        out_shape=tuple(out_sd),
        interpret=interpret,
    )(x)
    coeffs = [outs[-1]]
    for lvl in range(levels - 1, -1, -1):
        coeffs.append(tuple(outs[3 * lvl : 3 * lvl + 3]))
    return coeffs
