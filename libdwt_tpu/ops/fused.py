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

Border semantics: whole-point symmetric extension — in-step channel
mirrors at true image edges plus in-VMEM mirror fills for edge strips
(the virt2real analogue, /root/reference/src/dwt-sym.c:434-450).

Lifting arithmetic runs in POLYPHASE form (:func:`_poly_lift_ch`): the
tile is split once per direction into its even/odd channels (sublane
reshape; the lane direction rides a transpose sandwich), and each
lifting step is then ONE shifted copy + one fused multiply-add on
half-size arrays — ~3x fewer VPU ops than an interleaved
roll+parity-select formulation, which matters because these kernels
are VPU-compute-bound rather than bandwidth-bound.  The polyphase
deinterleave of the output subbands comes free.  Float steps use
libdwt's float constants; integer steps use the exact
``(w*(l+r) + k) >> s`` arithmetic of /root/reference/src/core-int.c:38-43
and are bit-exact against the separable oracle.
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

#: Mosaic scoped-VMEM ceiling for the strip kernels.  Mosaic's default
#: limit is 16MB but v5e has 128MB of physical VMEM; the polyphase
#: kernels' transpose sandwiches keep several strip-sized live copies,
#: so we raise the ceiling and let strip size be chosen by measurement.
_VMEM_LIMIT = 96 * 1024 * 1024


def _strip_params():
    """Compiler params for the strip-grid kernels: independent strips
    (parallel grid) + the raised scoped-VMEM ceiling."""
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=_VMEM_LIMIT,
    )


#: target input-window bytes per strip (tunable; see _pick_strip_rows).
_STRIP_TARGET_BYTES = 6 * 1024 * 1024
#: largest image the deep-pyramid kernel holds in VMEM (536x1024 f32 =
#: 2.24MB verified compiling on v5e; ~6 live copies inside the 16MB limit).
_DEEP_VMEM_LIMIT = int(2.4 * 1024 * 1024)


# ------------------------------------------------------------ step algebra


def _parity_mask(shape, axis, want_odd):
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=axis)
    par = ids % 2
    return (par == 1) if want_odd else (par == 0)


def _neighbors(t, axis: int, edges):
    """(left, right) interleaved-signal neighbours along ``axis``.

    ``edges = (fix_low, fix_high)``: where True, the out-of-signal
    neighbour produced by the wrap-around roll is replaced with the
    whole-point mirror value (x[-1] = x[1]; x[L] = x[L-2]) — the exact
    virt2real semantics (/root/reference/src/dwt-sym.c:434-450) applied
    in-kernel, for FREE, instead of via host-side reflect padding: the
    mirror of the edge sample's missing neighbour is just the OTHER
    roll's value at that position.  Valid for both even and odd L.
    """
    nl = jnp.roll(t, 1, axis)
    nr = jnp.roll(t, -1, axis)
    fix_low, fix_high = edges
    if fix_low or fix_high:
        ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, dimension=axis)
        out_l, out_r = nl, nr
        if fix_low:
            out_l = jnp.where(ids == 0, nr, nl)
        if fix_high:
            out_r = jnp.where(ids == t.shape[axis] - 1, nl, nr)
        nl, nr = out_l, out_r
    return nl, nr


def _lift_interleaved(
    t, wavelet: Wavelet, axis: int, inverse: bool, edges=(False, False)
):
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
            wl, wr = st.weights
            l, r = _neighbors(t, axis, edges)
            v = jax.lax.shift_right_arithmetic(
                wl * l + wr * r + st.k, jnp.asarray(st.shift, t.dtype)
            )
            upd = t + sign * v
            t = jnp.where(_parity_mask(t.shape, axis, st.target == "d"), upd, t)
    else:
        steps = wavelet.steps[::-1] if inverse else wavelet.steps
        sgn = -1.0 if inverse else 1.0
        for st in steps:
            l, r = _neighbors(t, axis, edges)
            if st.is_symmetric:
                delta = jnp.asarray(sgn * st.coeff, t.dtype) * (l + r)
            else:
                delta = jnp.asarray(sgn * st.left, t.dtype) * l \
                    + jnp.asarray(sgn * st.right, t.dtype) * r
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
    if wavelet.support > HALO:
        # every halo/mirror constant in the fused/streamed kernels (2-D
        # and 3-D) is sized for a 4-sample one-sided lifting support; a
        # longer wavelet would silently corrupt tile borders
        raise ValueError(
            f"wavelet {wavelet.name!r} has lifting support "
            f"{wavelet.support} > {HALO}; the fused kernels' halos are "
            "sized for support <= 4 (use impl='separable')"
        )


def _slice_ax(a, start, size, axis):
    return jax.lax.slice_in_dim(a, start, start + size, axis=axis)


def _mirror_head_ax(a, center: int, count: int, axis: int, repeat: bool):
    """Fill rows [center-count, center) of ``axis`` with the mirror of
    the rows at/after ``center``: whole-point (idx center-m := center+m)
    or repeat (:= center+m-1).  Rows below center-count are kept."""
    # skip zero-size parts: Mosaic rejects 0-extent vectors
    parts = (
        [_slice_ax(a, 0, center - count, axis)] if center > count else []
    )
    for m in range(count, 0, -1):
        src = center + m - 1 if repeat else center + m
        parts.append(_slice_ax(a, src, 1, axis))
    parts.append(_slice_ax(a, center, a.shape[axis] - center, axis))
    return jnp.concatenate(parts, axis=axis)


def _mirror_tail_ax(a, edge: int, count: int, axis: int, repeat: bool):
    """Fill rows (edge, edge+count] of ``axis`` with the mirror of the
    rows at/before ``edge`` (whole-point: edge+m := edge-m; repeat:
    := edge-m+1); zero anything beyond.  ``count`` clamps to the rows
    available past ``edge``."""
    L = a.shape[axis]
    count = max(0, min(count, L - 1 - edge))
    parts = [_slice_ax(a, 0, edge + 1, axis)]
    for m in range(1, count + 1):
        src = edge - m + 1 if repeat else edge - m
        parts.append(_slice_ax(a, src, 1, axis))
    used = edge + 1 + count
    if used < L:
        shape = list(a.shape)
        shape[axis] = L - used
        parts.append(jnp.zeros(shape, a.dtype))
    return jnp.concatenate(parts, axis=axis)


# ----------------------------------------------------------- size helpers


def _even(n: int) -> int:
    return n + (n % 2)


def _pick_strip_rows(wc: int, itemsize: int, inverse: bool) -> int:
    """Strip height targeting a ~6 MB input window (multiple of 16 so
    the half-resolution blocks stay 8-aligned).

    The lane-polyphase kernel bodies measured fastest with LARGE strips
    on v5e (the 2-level kernel: 0.377 ms/frame at 416 rows vs 0.524 at
    128, chain-slope protocol on 2144x4096) — the per-strip compute
    amortizes the halo re-read, and _strip_params raises the scoped
    VMEM ceiling to fit the live set.  The cap keeps several
    window-sized live copies under that ceiling for very wide images.
    """
    bytes_per_row = (wc + 2 * HALO) * itemsize
    target = _STRIP_TARGET_BYTES
    cap = _VMEM_LIMIT // ((12 if inverse else 10) * bytes_per_row)
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


def _merge_sub(a, b):
    """Interleave along sublanes via the (n,2,c)->(2n,c) sublane
    reshape — one shaped copy, no repeat+select."""
    n, c = a.shape
    return jnp.concatenate(
        [a.reshape(n, 1, c), b.reshape(n, 1, c)], axis=1
    ).reshape(2 * n, c)


# ------------------------------------------------- polyphase step algebra
#
# The interleaved step above costs two full-size rolls plus a parity
# select per lifting step.  The polyphase form below operates on the
# split channels (s[i]=x[2i], d[i]=x[2i+1]) where each step is ONE
# shifted copy + one fused multiply-add on HALF-size arrays — the
# arithmetic-lean layout the benchmark kernels use (the fused kernels
# are VPU-compute-bound, not bandwidth-bound, so every op counts; this
# is the TPU analogue of the reference's SDL register pipelines,
# /root/reference/src/inline-sdl.h:22-94).


def _shift_next(x, axis: int, fix: bool):
    """Neighbour at channel index i+1 along ``axis``; with ``fix`` the
    past-the-end entry is its whole-point mirror (x[L]=x[L-2] ->
    s[N] := s[N-1]) instead of the roll's wrap-around."""
    if not fix:
        return jnp.roll(x, -1, axis=axis)
    if axis == 0:
        return jnp.concatenate([x[1:], x[-1:]], axis=0)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    return jnp.where(ids == x.shape[axis] - 1, x, jnp.roll(x, -1, axis=axis))


def _shift_prev(x, axis: int, fix: bool):
    """Neighbour at channel index i-1 along ``axis``; with ``fix`` the
    before-the-start entry is its whole-point mirror (x[-1]=x[1] ->
    d[-1] := d[0])."""
    if not fix:
        return jnp.roll(x, 1, axis=axis)
    if axis == 0:
        return jnp.concatenate([x[:1], x[:-1]], axis=0)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    return jnp.where(ids == 0, x, jnp.roll(x, 1, axis=axis))


def _poly_lift_ch(
    s, d, wavelet: Wavelet, inverse: bool, edges=(False, False), axis: int = 0
):
    """All lifting steps of ``wavelet`` on polyphase channel arrays
    along ``axis`` (even total signal length).

    ``edges = (fix_low, fix_high)``: where True, the out-of-signal
    neighbour at the array end is replaced by its whole-point mirror
    (x[-1] = x[1]  ->  d[-1] := d[0];   x[L] = x[L-2]  ->  s[N] := s[N-1])
    — the virt2real semantics (/root/reference/src/dwt-sym.c:434-450)
    expressed in the channel domain.  Where False, the wrap-around
    roll's contamination stays within the caller's halo rows (≤ one
    channel row per step from each end).

    ``axis=1`` keeps the lifted axis in LANES, where Mosaic lowers a
    shift-by-one to a cheap lane rotate; sublane (axis 0) shifts are
    ~4x more expensive on v5e and measured as the dominant cost of the
    strip kernels.

    Arithmetic is identical to the interleaved path (and to the
    reference's C expressions), so integer results stay bit-exact.
    """
    fix_low, fix_high = edges
    is_int = jnp.issubdtype(s.dtype, jnp.integer)
    if is_int:
        steps = wavelet.int_steps
        if steps is None:
            raise ValueError(f"{wavelet.name}: no reversible integer path")
        if inverse:
            steps = steps[::-1]
    else:
        steps = wavelet.steps[::-1] if inverse else wavelet.steps

    for st in steps:
        if is_int:
            wl, wr = st.weights
        else:
            wl, wr = (st.coeff, st.coeff) if st.is_symmetric else (st.left, st.right)
        # neighbours from the opposite channel; skip the shifted copy
        # entirely when its weight is zero (Haar/D4 one-sided steps)
        if st.target == "d":
            l = s if wl else None
            r = _shift_next(s, axis, fix_high) if wr else None
        else:
            l = _shift_prev(d, axis, fix_low) if wl else None
            r = d if wr else None

        if is_int:
            sign = -st.sign if inverse else st.sign
            if l is not None and r is not None and wl == wr:
                acc = wl * (l + r) + st.k
            else:
                acc = jnp.asarray(st.k, s.dtype)
                if l is not None:
                    acc = acc + wl * l
                if r is not None:
                    acc = acc + wr * r
            upd = sign * jax.lax.shift_right_arithmetic(
                acc, jnp.asarray(st.shift, s.dtype)
            )
        else:
            sgn = -1.0 if inverse else 1.0
            if l is not None and r is not None and wl == wr:
                upd = jnp.asarray(sgn * wl, s.dtype) * (l + r)
            else:
                upd = None
                if l is not None:
                    upd = jnp.asarray(sgn * wl, s.dtype) * l
                if r is not None:
                    term = jnp.asarray(sgn * wr, s.dtype) * r
                    upd = term if upd is None else upd + term
                if upd is None:
                    continue
        if st.target == "d":
            d = d + upd
        else:
            s = s + upd
    return s, d


def _scale4(ll, hl, lh, hh, wavelet: Wavelet, inverse: bool):
    """Merged 2-D scaling on channel quadrants: four scalar multiplies
    (no parity masks).  Float only; integer transforms are unscaled."""
    if wavelet.scale_s is None or jnp.issubdtype(ll.dtype, jnp.integer):
        return ll, hl, lh, hh
    if inverse:
        lo = wavelet.inv_scale_s if wavelet.inv_scale_s is not None else wavelet.scale_d
        hi = wavelet.inv_scale_d if wavelet.inv_scale_d is not None else wavelet.scale_s
    else:
        lo, hi = wavelet.scale_s, wavelet.scale_d
    dt = ll.dtype
    return (
        ll * jnp.asarray(lo * lo, dt),
        hl * jnp.asarray(lo * hi, dt),
        lh * jnp.asarray(hi * lo, dt),
        hh * jnp.asarray(hi * hi, dt),
    )


def _analysis2d_poly(t, wavelet: Wavelet, row_edges=(False, False)):
    """Rows-then-columns 2-D lifting analysis of an interleaved tile.

    Returns channel quadrants (ll, hl, lh, hh), each (H/2, W/2),
    scaled — the polyphase deinterleave comes FREE (the lifting already
    operates on split channels), and the lane-axis polyphase rides the
    transpose sandwich once instead of per-step rolls.
    ``row_edges`` applies the in-step whole-point mirror at the true
    left/right signal ends (the lane direction).

    Integer tiles lift rows-then-columns with sublane shifts — the
    reference's axis order (/root/reference/src/libdwt.c:12829-12894),
    which the bit-exact golden parity requires (integer lifting does
    not commute across axes).  Float tiles lift columns-then-rows so
    that every shift lands on the LANE axis (six transposes, which
    Mosaic handles nearly for free, versus ~4x-priced sublane shifts);
    float axis order only moves last-ulp rounding.
    """
    if jnp.issubdtype(t.dtype, jnp.integer):
        tT = t.T
        sT, dT = _deint_sub(tT)  # lane polyphase via the transpose sandwich
        sT, dT = _poly_lift_ch(sT, dT, wavelet, False, row_edges)
        L, H = sT.T, dT.T  # (H, W/2) each: low / high x-lanes
        sL, dL = _deint_sub(L)
        sL, dL = _poly_lift_ch(sL, dL, wavelet, False)
        sH, dH = _deint_sub(H)
        sH, dH = _poly_lift_ch(sH, dH, wavelet, False)
        # (ll, hl, lh, hh) = (even y of L, even y of H, odd y of L, odd y of H)
        return _scale4(sL, sH, dL, dH, wavelet, False)
    # float: columns first, all shifts in lanes
    a, b = _deint_sub(t)  # (H/2, W): even / odd y rows
    aT, bT = a.T, b.T  # (W, H/2): channel axis now in lanes
    aT, bT = _poly_lift_ch(aT, bT, wavelet, False, axis=1)  # column lifting
    ls, ld = _deint_sub(aT)  # (W/2, H/2): x-channels of the y-lowpass
    ll, hl = _poly_lift_ch(ls.T, ld.T, wavelet, False, row_edges, axis=1)
    hs, hd = _deint_sub(bT)  # x-channels of the y-highpass
    lh, hh = _poly_lift_ch(hs.T, hd.T, wavelet, False, row_edges, axis=1)
    return _scale4(ll, hl, lh, hh, wavelet, False)


def _synthesis2d_poly(ll, hl, lh, hh, wavelet: Wavelet, row_edges=(False, False)):
    """2-D lifting synthesis from channel quadrants -> interleaved tile
    (2H, 2W) (inverse of :func:`_analysis2d_poly`).  Axis order mirrors
    the analysis: columns-then-rows for int, rows-then-columns (all
    shifts in lanes) for float."""
    ll, hl, lh, hh = _scale4(ll, hl, lh, hh, wavelet, True)
    if jnp.issubdtype(ll.dtype, jnp.integer):
        sL, dL = _poly_lift_ch(ll, lh, wavelet, True)
        sH, dH = _poly_lift_ch(hl, hh, wavelet, True)
        L = _merge_sub(sL, dL)
        H = _merge_sub(sH, dH)
        sT, dT = _poly_lift_ch(L.T, H.T, wavelet, True, row_edges)
        return _merge_sub(sT, dT).T
    # float: rows first, all shifts in lanes
    se, de = _poly_lift_ch(ll, hl, wavelet, True, row_edges, axis=1)
    Et = _merge_sub(se.T, de.T)  # (W, H/2): even y rows, transposed
    so, do = _poly_lift_ch(lh, hh, wavelet, True, row_edges, axis=1)
    Ot = _merge_sub(so.T, do.T)  # (W, H/2): odd y rows, transposed
    aT, bT = _poly_lift_ch(Et, Ot, wavelet, True, axis=1)  # column synthesis
    return _merge_sub(aT.T, bT.T)  # (2H, 2W)


# ---------------------------------------------------------- forward kernel


def _fwd_kernel(x_ref, ll_ref, hl_ref, lh_ref, hh_ref, *, wavelet, ty, wc):
    t = x_ref[:]
    # rows first, then columns — the reference's axis order
    # (/root/reference/src/libdwt.c:12829-12894); host mirror padding
    # supplies the borders, rolls wrap into discarded halo channels.
    ll, hl, lh, hh = _analysis2d_poly(t, wavelet)
    cy, cx = HALO // 2, HALO // 2  # window offset in channel rows/cols
    ll_ref[:] = ll[cy : cy + ty // 2, cx : cx + wc // 2]
    hl_ref[:] = hl[cy : cy + ty // 2, cx : cx + wc // 2]
    lh_ref[:] = lh[cy : cy + ty // 2, cx : cx + wc // 2]
    hh_ref[:] = hh[cy : cy + ty // 2, cx : cx + wc // 2]


#: row halo of the PAD-FREE single-level forward windows (>= HALO, and
#: a multiple of 8 so clamped window starts stay provably aligned).
HALOR1 = 8


def _fwd_kernel_pf(x_ref, ll_ref, hl_ref, lh_ref, hh_ref, t_s,
                   *, wavelet, ty, wc, er, ny):
    """Pad-free single-level forward body: windows read straight from
    the unpadded image (clamped starts + high element padding); column
    borders via the in-step mirror, row borders materialized in VMEM
    for the edge strips only."""
    pid = pl.program_id(0)
    # edge fixups run ONLY on the strips that need them (pl.when):
    # interior strips read their window straight from x_ref, paying
    # nothing — the old where()-selects built every mirror for every
    # strip and discarded them.
    t_s[:] = x_ref[:]

    @pl.when(pid == 0)
    def _():
        t_s[:] = _mirror_head_sub(jnp.roll(t_s[:], HALOR1, axis=0),
                                  HALOR1, HALO)

    @pl.when(pid == ny - 1)
    def _():
        t_s[:] = _mirror_tail_sub(t_s[:], er, HALO)

    if ny >= 2 and er < 2 * HALOR1:
        # a short last strip means the PENULTIMATE strip's window also
        # crosses the image end; mirror-fill it at its own edge row
        @pl.when(pid == ny - 2)
        def _():
            t_s[:] = _mirror_tail_sub(t_s[:], er + ty, HALO)

    ll, hl, lh, hh = _analysis2d_poly(t_s[:], wavelet, row_edges=(True, True))
    c = HALOR1 // 2
    ll_ref[:] = ll[c : c + ty // 2, :]
    hl_ref[:] = hl[c : c + ty // 2, :]
    lh_ref[:] = lh[c : c + ty // 2, :]
    hh_ref[:] = hh[c : c + ty // 2, :]


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
    if strip_rows and strip_rows % 16:
        # same contract as the 2-level kernels: reject rather than
        # silently rounding (a tuner probing 96 and 100 would otherwise
        # measure the same kernel twice)
        raise ValueError("strip_rows must be a multiple of 16")

    if boundary_rows == "mirror" and h % 2 == 0 and w % 2 == 0:
        # fast path: pad-free windows straight from the unpadded image
        ty = strip_rows or _pick_strip_rows(w, x.dtype.itemsize, inverse=False)
        ty = max(16, (ty // 16) * 16)
        if h <= ty:
            ty = ((h + 15) // 16) * 16
        ny = pl.cdiv(h, ty)

        def idx(i):
            return (pl.multiple_of(jnp.maximum(i * ty - HALOR1, 0), 8), 0)

        pad_hi = max(ny * ty + HALOR1, ty + 2 * HALOR1) - h
        xp = x
        if interpret:
            xp = jnp.pad(x, ((0, pad_hi), (0, 0)))
            pad_hi = 0
        in_spec = pl.BlockSpec(
            (pl.Element(ty + 2 * HALOR1, (0, pad_hi)), pl.Element(w, (0, 0))),
            idx,
            memory_space=pltpu.VMEM,
        )
        hy, hx = ty // 2, w // 2
        out_sd = jax.ShapeDtypeStruct((ny * hy, hx), x.dtype)
        out_spec = pl.BlockSpec((hy, hx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        er = h - 1 - (ny - 1) * ty + HALOR1
        kernel = functools.partial(
            _fwd_kernel_pf, wavelet=wavelet, ty=ty, wc=w, er=er, ny=ny
        )
        ll, hl, lh, hh = pl.pallas_call(
            kernel,
            grid=(ny,),
            in_specs=[in_spec],
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            out_shape=(out_sd, out_sd, out_sd, out_sd),
            scratch_shapes=[pltpu.VMEM((ty + 2 * HALOR1, w), x.dtype)],
            interpret=interpret,
            compiler_params=None if interpret else _strip_params(),
        )(xp)
        cy = h // 2
        return ll[:cy], hl[:cy], lh[:cy], hh[:cy]

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
        compiler_params=None if interpret else _strip_params(),
    )(xp)

    cy, cx = -(-h // 2), -(-w // 2)
    fy, fx = h // 2, w // 2
    return ll[:cy, :cx], hl[:cy, :fx], lh[:fy, :cx], hh[:fy, :fx]


# ----------------------------------------------- multi-scale fused kernel


#: halo for the two-level kernel: level-1 outputs need +-4 LL samples
#: (+-8 signal) on top of level 0's +-4.
HALO2 = 12


def _mirror_tail_sub(a, edge: int, count: int):
    """Whole-point mirror of sublanes past ``edge``: rows edge+1..edge+count
    become rows edge-1..edge-count; anything beyond is zeroed."""
    return _mirror_tail_ax(a, edge, count, 0, repeat=False)


#: row halo of the PAD-FREE multi-scale kernel: >= HALO2 and a multiple
#: of 8 so window starts i*ty - HALOR stay provably 8-aligned.
HALOR = 16


def _mirror_head_sub(a, center: int, count: int):
    """Whole-point mirror of sublanes above ``center``: rows center-m
    become rows center+m for m=1..count; rows below center-count are
    kept (they are outside any halo and never read)."""
    return _mirror_head_ax(a, center, count, 0, repeat=False)


def _2lvl_kernel(x_ref, ll2_ref, hl2_ref, lh2_ref, hh2_ref,
                 hl1_ref, lh1_ref, hh1_ref, t_s, ll_s,
                 *, wavelet, ty, wc, er, er_ll, ny):
    """Pad-free multi-scale kernel body.

    The window is (ty + 2*HALOR, wc) read straight from the UNPADDED
    image (element windows with padding bounds; the first/last strips'
    out-of-image rows are garbage).  Column borders use the in-step
    mirror of :func:`_neighbors` — no column halo at all; row borders
    are materialized in VMEM for the edge strips only.  Compared to the
    host-reflect-pad design this removes one full read+write of the
    frame from HBM traffic.
    """
    pid = pl.program_id(0)
    # Edge fixups run ONLY on the strips that need them (pl.when) —
    # interior strips pay a plain VMEM copy instead of building and
    # discarding every mirror/roll.
    t_s[:] = x_ref[:]

    # ---- first strip: its window start was clamped from -HALOR to 0
    # (Mosaic supports only HIGH element-window padding), so image row 0
    # sits at window row 0 instead of HALOR; a constant roll normalizes
    # the layout, then the symmetric row extension is built in VMEM:
    # rows HALOR-m := HALOR+m for m=1..HALO2 (the remaining
    # HALOR-HALO2 rows stay garbage; lifting contamination from them
    # never reaches a kept output row).
    @pl.when(pid == 0)
    def _():
        t_s[:] = _mirror_head_sub(jnp.roll(t_s[:], HALOR, axis=0),
                                  HALOR, HALO2)

    # ---- last strip: rows er+m := er-m, zeros beyond.
    @pl.when(pid == ny - 1)
    def _():
        t_s[:] = _mirror_tail_sub(t_s[:], er, HALO2)

    if ny >= 2 and er < 2 * HALOR:
        # short last strip: the penultimate window also crosses the end
        @pl.when(pid == ny - 2)
        def _():
            t_s[:] = _mirror_tail_sub(t_s[:], er + ty, HALO2)

    # ---- level 0: columns mirror in-step (exact whole-point border),
    # rows rely on the halo.
    ll, hl1, lh1, hh1 = _analysis2d_poly(t_s[:], wavelet, row_edges=(True, True))
    c = HALOR // 2  # 8: channel-domain row halo
    hl1_ref[:] = hl1[c : c + ty // 2, :]
    lh1_ref[:] = lh1[c : c + ty // 2, :]
    hh1_ref[:] = hh1[c : c + ty // 2, :]

    # ---- level-1 bottom fixup: the signal-domain bottom mirror induces
    # a HALF-point mirror on the low channel (s[N+m] = s[N-1-m]), but
    # the oracle extends the level-1 input whole-point around its last
    # sample (s[N-1+m] = s[N-1-m]).  Rewrite the LL rows past the image
    # edge accordingly (last strip only).  The top halo needs no fix
    # (x[-k] = x[k] already induces s[-m] = s[m]), and columns are
    # handled exactly by the in-step mirror at the true LL width.
    # ll: (ty/2 + HALOR, wc/2)
    ll_s[:] = ll

    @pl.when(pid == ny - 1)
    def _():
        ll_s[:] = _mirror_tail_sub(ll_s[:], er_ll, HALO2 // 2)

    if ny >= 2 and er_ll < 2 * (HALOR // 2):
        @pl.when(pid == ny - 2)
        def _():
            ll_s[:] = _mirror_tail_sub(ll_s[:], er_ll + ty // 2, HALO2 // 2)

    ll = ll_s[:]

    # ---- level 1 (needs 4 valid LL rows around the kept strip; the
    # 8-row halo absorbs that plus level-0's contaminated edge rows)
    ll2, hl2, lh2, hh2 = _analysis2d_poly(
        ll, wavelet, row_edges=(True, True)
    )  # (ty/4 + 8, wc/4)
    c2 = c // 2  # 4
    ll2_ref[:] = ll2[c2 : c2 + ty // 4, :]
    hl2_ref[:] = hl2[c2 : c2 + ty // 4, :]
    lh2_ref[:] = lh2[c2 : c2 + ty // 4, :]
    hh2_ref[:] = hh2[c2 : c2 + ty // 4, :]


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
    VMEM strips: each pixel is read from HBM once (plus the strip halo)
    for both levels, and — unlike a host-padded design — never copied
    into a padded staging buffer first.

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
    # 416-row strips measured fastest for the lane-polyphase body on
    # v5e (0.377 ms/frame vs 0.429 at 192, 0.389 at 320, 0.426 at 544,
    # chain-slope protocol on a 2144x4096 frame): the heavier per-strip
    # compute amortizes the halo re-read and the raised scoped-VMEM
    # ceiling (_VMEM_LIMIT) makes the larger live set legal.
    if strip_rows:
        ty = strip_rows
    else:
        # cap the auto strip so one input window — (ty + 2*HALOR) rows
        # by w columns — stays <= ~8 MB (the kernel keeps several
        # window-sized live copies; very wide frames would otherwise
        # overrun even the raised VMEM ceiling)
        cap = (8 * 1024 * 1024 // (w * x.dtype.itemsize) - 2 * HALOR) \
            // 32 * 32
        if cap < 32:
            raise ValueError(
                "frame too wide for the 2-level fused kernel's VMEM "
                "window; use single-level or separable"
            )
        ty = min(416, cap)
    # alignment: ty % 32 == 0 makes window starts (i*ty - 16) and all
    # out blocks (ty/2, ty/4) provably 8-aligned.
    if ty % 32:
        raise ValueError("strip_rows must be a multiple of 32")
    if h <= ty:
        ty = ((h + 31) // 32) * 32
    ny = pl.cdiv(h, ty)

    # Window starts are clamped to 0 in the index map (Mosaic supports
    # only HIGH element-window padding; the kernel roll-normalizes the
    # first strip).  Both clamp branches are provably 8-aligned.
    def idx(i):
        return (pl.multiple_of(jnp.maximum(i * ty - HALOR, 0), 8), 0)

    pad_hi = max(ny * ty + HALOR, ty + 2 * HALOR) - h
    if interpret:
        # Interpret resolves windows with clamping dynamic slices whose
        # end-clamp would silently shift the last strip; emulate the
        # high padding bound with a real zero pad instead.
        xp = jnp.pad(x, ((0, pad_hi), (0, 0)))
        pad_hi = 0
    else:
        xp = x
    in_spec = pl.BlockSpec(
        (pl.Element(ty + 2 * HALOR, (0, pad_hi)), pl.Element(wc, (0, 0))),
        idx,
        memory_space=pltpu.VMEM,
    )

    q2y, q2x = ty // 2, wc // 2
    q4y, q4x = ty // 4, wc // 4
    sd2 = jax.ShapeDtypeStruct((ny * q2y, q2x), x.dtype)
    sd4 = jax.ShapeDtypeStruct((ny * q4y, q4x), x.dtype)
    spec2 = pl.BlockSpec((q2y, q2x), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((q4y, q4x), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # window-row coords of the image's last valid row / LL row in the
    # LAST strip's window
    er = h - 1 - (ny - 1) * ty + HALOR
    er_ll = h // 2 - 1 - (ny - 1) * (ty // 2) + HALOR // 2
    kernel = functools.partial(
        _2lvl_kernel, wavelet=wavelet, ty=ty, wc=wc, er=er, er_ll=er_ll, ny=ny
    )
    ll2, hl2, lh2, hh2, hl1, lh1, hh1 = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[in_spec],
        out_specs=(spec4, spec4, spec4, spec4, spec2, spec2, spec2),
        out_shape=(sd4, sd4, sd4, sd4, sd2, sd2, sd2),
        scratch_shapes=[
            pltpu.VMEM((ty + 2 * HALOR, wc), x.dtype),
            pltpu.VMEM((ty // 2 + HALOR, wc // 2), x.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _strip_params(),
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
            and fused_supported(wavelet)
            and (32 + 2 * HALOR) * w * ll.dtype.itemsize <= 8 * 1024 * 1024
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
    # channel windows go straight into the polyphase synthesis
    # (inverse axis order: columns first, then rows); host channel-
    # mirror padding supplies the borders.
    t = _synthesis2d_poly(ll_ref[:], hl_ref[:], lh_ref[:], hh_ref[:], wavelet)
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


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "boundary_rows"))
def fused_idwt2_level(
    ll, hl, lh, hh,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    boundary_rows: str = "mirror",
) -> jax.Array:
    """Single-level fused 2-D inverse DWT (inverse of fused_dwt2_level).

    ``boundary_rows='extended'`` means the caller already supplied CH
    valid channel rows above and below every band (the sharded path's
    halo-exchange case, with the same CH=4) — no row-direction channel
    mirror is applied; columns still mirror.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if boundary_rows not in ("mirror", "extended"):
        raise ValueError("boundary_rows must be 'mirror' or 'extended'")
    extended = boundary_rows == "extended"
    cy, cx = ll.shape[-2], ll.shape[-1]
    if extended:
        cy -= 2 * CH
        fy, fx = hh.shape[-2] - 2 * CH, hh.shape[-1]
    else:
        fy, fx = hh.shape[-2], hh.shape[-1]
    h, w = cy + fy, cx + fx
    if min(h, w) < 2 * (CH + 1):  # channel mirror needs CH+1 samples
        raise ValueError("image too small for the fused kernel; use the oracle")
    if strip_rows and strip_rows % 16:
        raise ValueError("strip_rows must be a multiple of 16")
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
        if not extended:
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
        compiler_params=None if interpret else _strip_params(),
    )(llp, hlp, lhp, hhp)
    return out[:h, :w]


# ------------------------------------------- multi-scale inverse kernel


def _mirror_tail_sub_repeat(a, edge: int, count: int):
    """Repeat-mirror of sublanes past ``edge``: ext[edge+1+m] = a[edge-m]
    (the oracle's even-length bottom rule s[Ns+m] = s[Ns-1-m])."""
    return _mirror_tail_ax(a, edge, count, 0, repeat=True)


def _mirror_head_sub_repeat(a, center: int, count: int):
    """Repeat-head mirror of sublanes above ``center``: rows center-m
    become rows center+m-1 (the channel rule d[-m] = d[m-1]); rows
    below center-count are kept."""
    return _mirror_head_ax(a, center, count, 0, repeat=True)


#: row-channel halo of the pad-free multi-scale inverse windows
#: (multiple of 8 so clamped starts stay provably aligned).
CHR = 8
#: mirror-fill depth at volume edges inside those windows.
CFIX = 6


def _chan_fix_ref(ref, src_ref, is_low, pid, n_strips, er, stride):
    """Channel-domain mirror fill via scratch refs: copies the band
    window and applies the roll-normalization + mirror fills ONLY on
    the strips that need them (pl.when) — interior strips pay one VMEM
    copy instead of building and discarding every fill."""
    ref[:] = src_ref[:]

    @pl.when(pid == 0)
    def _():
        rolled = jnp.roll(ref[:], CHR, axis=0)
        ref[:] = (
            _mirror_head_sub(rolled, CHR, CFIX)
            if is_low
            else _mirror_head_sub_repeat(rolled, CHR, CFIX)
        )

    tail_fn = _mirror_tail_sub_repeat if is_low else _mirror_tail_sub

    @pl.when(pid == n_strips - 1)
    def _():
        ref[:] = tail_fn(ref[:], er, CFIX)

    if n_strips >= 2 and er < 2 * CHR:
        @pl.when(pid == n_strips - 2)
        def _():
            ref[:] = tail_fn(ref[:], er + stride, CFIX)

    return ref[:]


def _inv2_kernel(ll2_ref, hl2_ref, lh2_ref, hh2_ref,
                 hl1_ref, lh1_ref, hh1_ref, out_ref,
                 q0_s, q1_s, q2_s, q3_s, h0_s, h1_s, h2_s, ll1_s,
                 *, wavelet, ty, wc, er2, er1, ny):
    """Pad-free multi-scale inverse body.

    Band windows are read straight from the UNPADDED coefficient
    arrays (row-channel halo CHR, full-width lanes); volume-edge halos
    are mirror-filled in VMEM for the first/last strips only
    (:func:`_chan_fix_ref`), and column borders use the in-step mirror
    of :func:`_neighbors` — no host padding pass at all.
    """
    pid = pl.program_id(0)
    qy, hy = ty // 4, ty // 2
    # ---- level-2 windows: fix row halos (ll2/hl2 are row-low 's'
    # channels, lh2/hh2 row-high 'd' channels) — edge strips only
    ll2 = _chan_fix_ref(q0_s, ll2_ref, True, pid, ny, er2, qy)
    hl2 = _chan_fix_ref(q1_s, hl2_ref, True, pid, ny, er2, qy)
    lh2 = _chan_fix_ref(q2_s, lh2_ref, False, pid, ny, er2, qy)
    hh2 = _chan_fix_ref(q3_s, hh2_ref, False, pid, ny, er2, qy)

    # ---- level-2 inverse (polyphase synthesis with in-step column
    # mirror at the true LL1 width)
    t2 = _synthesis2d_poly(
        ll2, hl2, lh2, hh2, wavelet, row_edges=(True, True)
    )  # (hy + 4*CHR, wc/2)
    # LL1 rows [i*hy - CHR, i*hy + hy + CHR) live at t2 rows
    # [CHR, CHR + hy + 2*CHR)
    ll1 = t2[CHR : CHR + hy + 2 * CHR, :]

    # ---- LL1 bottom fixup (last strip): reconstruction beyond the
    # image edge must follow the level-1 channel repeat mirror
    # s[N+m] = s[N-1-m]; the top halo is already consistent
    # (s[-m] = s[m] falls out of the mirrored level-2 inputs).
    ll1_s[:] = ll1

    @pl.when(pid == ny - 1)
    def _():
        ll1_s[:] = _mirror_tail_sub_repeat(ll1_s[:], er1, CFIX)

    if ny >= 2 and er1 < 2 * CHR:
        @pl.when(pid == ny - 2)
        def _():
            ll1_s[:] = _mirror_tail_sub_repeat(ll1_s[:], er1 + hy, CFIX)

    ll1 = ll1_s[:]

    # ---- level-1 windows + inverse
    hl1 = _chan_fix_ref(h0_s, hl1_ref, True, pid, ny, er1, hy)
    lh1 = _chan_fix_ref(h1_s, lh1_ref, False, pid, ny, er1, hy)
    hh1 = _chan_fix_ref(h2_s, hh1_ref, False, pid, ny, er1, hy)
    t1 = _synthesis2d_poly(
        ll1, hl1, lh1, hh1, wavelet, row_edges=(True, True)
    )  # (ty + 4*CHR, wc)
    out_ref[:] = t1[2 * CHR : 2 * CHR + ty, :]


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
    by 4 and a symmetric-step wavelet.  Like the forward, the kernel
    reads the unpadded coefficient arrays directly — no host padding
    pass over the data.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    hl2, lh2, hh2 = bands2
    hl1, lh1, hh1 = bands1
    h = hl1.shape[-2] + lh1.shape[-2]
    w = hl1.shape[-1] + lh1.shape[-1]
    if h % 4 or w % 4:
        raise ValueError("fused_idwt2_2level needs h, w divisible by 4")
    if min(h, w) < 4 * (CFIX + 1):
        raise ValueError("image too small for the 2-level fused inverse")
    wc = w
    # large strips win for the lane-polyphase synthesis exactly as for
    # the analysis (the CHR channel halos are re-read per strip; at 96
    # rows the level-2 windows are 67% halo) — reuse the measured
    # picker, rounded down to the 32-row alignment this kernel needs.
    ty = strip_rows or max(
        96, (_pick_strip_rows(wc, ll2.dtype.itemsize, True) // 32) * 32
    )
    if ty % 32:
        raise ValueError("strip_rows must be a multiple of 32")
    if h <= ty:
        ty = ((h + 31) // 32) * 32
    ny = pl.cdiv(h, ty)
    hy, hx = ty // 2, wc // 2
    qy, qx = ty // 4, wc // 4
    cy1, cy2 = h // 2, h // 4  # channel row counts at levels 1/2

    def idx_q(i):
        return (pl.multiple_of(jnp.maximum(i * qy - CHR, 0), 8), 0)

    def idx_h(i):
        return (pl.multiple_of(jnp.maximum(i * hy - CHR, 0), 8), 0)

    pad_q = max(ny * qy + CHR, qy + 2 * CHR) - cy2
    pad_h = max(ny * hy + CHR, hy + 2 * CHR) - cy1
    ins = [ll2, hl2, lh2, hh2, hl1, lh1, hh1]
    if interpret:
        # interpret's clamping dynamic slices would shift the last
        # strip; emulate the high padding bound with a real zero pad.
        ins = [jnp.pad(b, ((0, pad_q), (0, 0))) for b in ins[:4]] + [
            jnp.pad(b, ((0, pad_h), (0, 0))) for b in ins[4:]
        ]
        pad_q = pad_h = 0
    spec_q = pl.BlockSpec(
        (pl.Element(qy + 2 * CHR, (0, pad_q)), pl.Element(qx, (0, 0))),
        idx_q,
        memory_space=pltpu.VMEM,
    )
    spec_h = pl.BlockSpec(
        (pl.Element(hy + 2 * CHR, (0, pad_h)), pl.Element(hx, (0, 0))),
        idx_h,
        memory_space=pltpu.VMEM,
    )
    # window rows of the last valid channel sample in the LAST strip
    er2 = cy2 - 1 - ((ny - 1) * qy - CHR)
    er1 = cy1 - 1 - ((ny - 1) * hy - CHR)
    out_sd = jax.ShapeDtypeStruct((ny * ty, wc), ll2.dtype)
    kernel = functools.partial(
        _inv2_kernel, wavelet=wavelet, ty=ty, wc=wc, er2=er2, er1=er1, ny=ny
    )
    qwin = (qy + 2 * CHR, wc // 4)
    hwin = (hy + 2 * CHR, wc // 2)
    out = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[spec_q] * 4 + [spec_h] * 3,
        out_specs=pl.BlockSpec((ty, wc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM(qwin, ll2.dtype)] * 4
        + [pltpu.VMEM(hwin, ll2.dtype)] * 3
        + [pltpu.VMEM((hy + 2 * CHR, wc // 2), ll2.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else _strip_params(),
    )(*ins)
    return out[:h, :w]


def fused_waverec2(coeffs, wavelet="cdf97", interpret: bool = False):
    """Multi-level reconstruction using the 2-level fused inverse where
    geometry allows, the separable oracle otherwise.  Inverse of
    :func:`fused_wavedec2` / wavedec2."""
    from libdwt_tpu.ops.separable import idwt2_level

    ll = coeffs[0]
    rest = list(coeffs[1:])
    min_fused = 1024

    # pyramid tail first: reconstruct every SMALL coarse level in one
    # VMEM-resident launch (the inverse twin of fused_deep_wavedec2) —
    # these levels are latency-bound, not bandwidth-bound.
    if ll.ndim == 2 and fused_supported(wavelet):
        # the deep tail's channel mirrors need CH+1 samples per axis
        # (_pad_ch_static slices up to row CH); reconstruct smaller
        # coarsest levels with the oracle first
        while rest and min(ll.shape[-2], ll.shape[-1]) <= CH:
            hl, lh, hh = rest[0]
            h0 = ll.shape[-2] + lh.shape[-2]
            w0 = ll.shape[-1] + hl.shape[-1]
            if (hl.shape[-2:] != (ll.shape[-2], w0 // 2)
                    or lh.shape[-2:] != (h0 // 2, ll.shape[-1])
                    or hh.shape[-2:] != (h0 // 2, w0 // 2)):
                break
            ll = idwt2_level(ll, hl, lh, hh, wavelet)
            rest = rest[1:]
        deep = 0
        ch, cw = ll.shape[-2], ll.shape[-1]
        for (hl, lh, hh) in rest:
            h, w = ch + lh.shape[-2], cw + hl.shape[-1]
            if (
                hl.shape != (ch, w // 2)
                or lh.shape != (h // 2, cw)
                or hh.shape != (h // 2, w // 2)
                or (h + 8) * (w + 8) * ll.dtype.itemsize > _DEEP_VMEM_LIMIT
            ):
                break
            deep += 1
            ch, cw = h, w
        if deep:
            ll = fused_deep_waverec2(
                [ll] + rest[:deep], wavelet, interpret=interpret
            )
            rest = rest[deep:]

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
        # cur's shape is exactly (ch, cw) every iteration (it starts as
        # the full image and each pass ends with the [:cy, :cx] slice)
        ext = _mirror_ext2(cur, HALO)
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
        # grid-less call: vmem ceiling only (no grid dims to annotate)
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x)
    coeffs = [outs[-1]]
    for lvl in range(levels - 1, -1, -1):
        coeffs.append(tuple(outs[3 * lvl : 3 * lvl + 3]))
    return coeffs

# -------------------------------------------- deep-pyramid inverse kernel


def _pad_ch_static(c, signal_len: int, is_low: bool, axis: int):
    """In-kernel analogue of :func:`_pad_channel_mirror`: extend a
    polyphase channel by CH samples each side with the channel-domain
    whole-point mirror, built from static single-row slices (Mosaic has
    no reverse primitive and rejects strided slices).  Both channels of
    an odd ``signal_len`` leave with ceil(signal_len/2) + 2*CH samples
    (the high channel also gains its missing ceil-grid sample)."""
    if axis != 0:
        return _pad_ch_static(c.T, signal_len, is_low, 0).T
    odd = signal_len % 2 == 1
    nc = c.shape[0]
    if is_low:
        top = [c[m : m + 1] for m in range(CH, 0, -1)]
        start, count = (1 if odd else 0), CH
    else:
        top = [c[m : m + 1] for m in range(CH - 1, -1, -1)]
        start, count = (0 if odd else 1), CH + (1 if odd else 0)
    bot = [c[nc - 1 - start - i : nc - start - i] for i in range(count)]
    return jnp.concatenate(top + [c] + bot, axis=0)


def _deep_inv_kernel(*refs, wavelet, shapes):
    """VMEM-resident multi-level reconstruction: coarsest LL + per-level
    band triples -> the LL of the finest provided level, all in one
    launch.  ``shapes`` = [(h, w)] target size per level, coarse
    first."""
    cur = refs[0][:]
    bands = list(refs[1:-1])
    out_ref = refs[-1]
    for (h, w) in shapes:
        hl, lh, hh = bands.pop(0)[:], bands.pop(0)[:], bands.pop(0)[:]
        llp = _pad_ch_static(_pad_ch_static(cur, h, True, 0), w, True, 1)
        hlp = _pad_ch_static(_pad_ch_static(hl, h, True, 0), w, False, 1)
        lhp = _pad_ch_static(_pad_ch_static(lh, h, False, 0), w, True, 1)
        hhp = _pad_ch_static(_pad_ch_static(hh, h, False, 0), w, False, 1)
        t = _synthesis2d_poly(llp, hlp, lhp, hhp, wavelet)
        cur = t[2 * CH : 2 * CH + h, 2 * CH : 2 * CH + w]
    out_ref[:] = cur


@functools.partial(jax.jit, static_argnames=("wavelet", "interpret"))
def fused_deep_waverec2(coeffs, wavelet="cdf97", interpret: bool = False):
    """Inverse of :func:`fused_deep_wavedec2`: reconstruct ALL provided
    pyramid levels in ONE kernel launch with everything resident in
    VMEM — the deep levels are latency-bound, and this removes their
    per-level HBM round trips and launches.  ``coeffs`` is a wavedec2
    pytree prefix [LLn, (hl_n, lh_n, hh_n), ..., (hl_1, lh_1, hh_1)];
    returns the reconstructed image at the finest provided level.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    ll = coeffs[0]
    if ll.ndim != 2:
        raise ValueError("fused_deep_waverec2 takes one 2-D pyramid")
    if len(coeffs) > 1 and min(ll.shape) <= CH:
        # _pad_ch_static's channel mirror slices up to row CH; a smaller
        # coarsest LL silently builds short/shifted extensions
        raise ValueError(
            f"coarsest LL {ll.shape} too small for the deep inverse's "
            f"channel mirrors (needs > {CH} samples per axis)"
        )
    shapes = []
    ch, cw = ll.shape
    for (hl, lh, hh) in coeffs[1:]:
        h = ch + lh.shape[-2]
        w = cw + hl.shape[-1]
        if hl.shape != (ch, w // 2) or lh.shape != (h // 2, cw) \
                or hh.shape != (h // 2, w // 2):
            raise ValueError("band shapes do not chain into a pyramid")
        shapes.append((h, w))
        ch, cw = h, w
    if not shapes:
        return ll
    h, w = shapes[-1]
    if (h + 8) * (w + 8) * ll.dtype.itemsize > _DEEP_VMEM_LIMIT:
        raise ValueError("pyramid too large to reconstruct in VMEM")

    ins = [coeffs[0]]
    for lvl in coeffs[1:]:
        ins.extend(lvl)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _deep_inv_kernel, wavelet=wavelet, shapes=tuple(shapes)
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[spec] * len(ins),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w), ll.dtype),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*ins)
    return out
