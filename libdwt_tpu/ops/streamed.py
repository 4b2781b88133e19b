"""Manually-pipelined (double-buffered) strip kernels.

The pallas-grid kernels in :mod:`libdwt_tpu.ops.fused` rely on Mosaic's
automatic window pipeline, which was MEASURED not to overlap DMA with
compute on v5e (chain-slope ablation, 4K frame: a stream-only body
0.139 ms/frame and 8 dummy FMA passes 0.221 ms — perfectly additive).
The kernels here stream strips through two VMEM slots with explicit
``make_async_copy`` double buffering — the guide's double-buffering
pattern — so the next strip's load and the previous strip's store ride
under the current strip's lifting compute.

Two further structural wins over the grid kernels:

  * the strip loop is unrolled in Python, so EVERY strip has static
    geometry: the DMA places each strip's rows at a fixed buffer
    offset (no roll normalization at all) and border mirror fills are
    emitted only for the strips that need them (no pl.when, no
    discarded selects);
  * the coefficient arrays are read/written in place in HBM — like the
    grid kernels there is no host padding pass, and unlike
    ``fused_idwt2_level`` the inverse needs no host channel-mirror
    staging copies.

Semantics are identical to the separable oracle (and therefore to the
reference: dwt_cdf97_2f_s /root/reference/src/libdwt.c:12776, the
multi-scale fused loop of /root/reference/src/dwt-sym-ms.c): whole-point
symmetric borders, ceil/floor channel split, float to association
tolerance and integers bit-exactly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops.fused import (
    CFIX,
    CH,
    HALO,
    HALO2,
    _DEEP_VMEM_LIMIT,
    _analysis2d_poly,
    _check_fused_supported,
    _deint_sub,
    _pad_ch_static,
    _lift_interleaved,
    _mirror_ext2,
    _mirror_head_sub,
    _mirror_head_sub_repeat,
    _mirror_tail_sub,
    _mirror_tail_sub_repeat,
    _scale_interleaved,
    _synthesis2d_poly,
)

__all__ = [
    "streamed_supported",
    "streamed_deep_ok",
    "streamed_wavedec2_deep",
    "streamed_waverec2_deep",
    "streamed_dwt2_level",
    "streamed_dwt2_2level",
    "streamed_idwt2_level",
    "streamed_idwt2_2level",
    "streamed_wavedec2",
    "streamed_waverec2",
]

#: top halo rows of every strip buffer (image/band row ``i*stride`` sits
#: at buffer row TOP): 8 keeps all DMA offsets sublane-aligned.
TOP = 8
#: channel-domain mirror depth of the single-level kernels.
CMIR = 4
#: unrolled-strip budget: past this many strips compile time grows
#: linearly for no perf gain — callers should fall back to the grid
#: kernels (the strips only amortize better up to a few dozen).
MAX_STRIPS = 32

_VMEM_LIMIT = 96 * 1024 * 1024


def pick_strip(h: int, preferred: int = 256) -> int:
    """Strip rows: the preferred size, shrunk so the image still splits
    into >= 2 strips (the double-buffer needs a pipeline), 32-aligned.
    The caller's preference is rounded down to the alignment too — the
    2-level kernels' quarter-row accounting needs ty % 4 == 0."""
    preferred = max(64, (preferred // 32) * 32)
    ty = min(preferred, ((h // 2) // 32) * 32)
    return max(64, ty)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _require(cond: bool, msg: str) -> None:
    """Trace-time geometry invariant.  A plain ``assert`` would both
    vanish under ``python -O`` (silently emitting clamped mirror rows)
    and escape the ``except ValueError`` fallbacks in the pyramid
    drivers; every kernel geometry check goes through here instead."""
    if not cond:
        raise ValueError(f"streamed kernel geometry: {msg}")


def _strip_geom(i: int, total: int, stride: int, top: int = TOP,
                origin: int = 0):
    """(want_lo, src_start, length, buf_offset) of strip ``i``'s DMA
    window over a band of ``total`` rows walked ``stride`` rows per
    strip with a ``top``-row halo above and below.  ``origin`` shifts
    the band's row 0 into the source array (the 'extended' boundary
    mode, where the caller supplied ``origin`` valid halo rows above
    the band)."""
    want_lo = i * stride - top + origin
    s = max(want_lo, 0)
    e = min(i * stride + stride + top + origin, total)
    return want_lo, s, e - s, s - want_lo


def _zero_dma_gaps(buf, i: int, total: int, stride: int, tyw: int,
                   w: int, dtype, top: int = TOP) -> None:
    """Zero a strip buffer's DMA gap rows (head halo of the first
    strip, past-the-end tail of the last).  The MXU banded windows SUM
    over them with zero weights, and 0*garbage (NaN/Inf in fresh VMEM)
    would poison whole matmul blocks — the polyphase body never lets
    them reach a kept row, matmuls do."""
    _, s, L, o = _strip_geom(i, total, stride, top)
    if o > 0:
        buf[i % 2, pl.ds(0, o), :] = jnp.zeros((o, w), dtype)
    if o + L < tyw:
        buf[i % 2, pl.ds(o + L, tyw - o - L), :] = jnp.zeros(
            (tyw - o - L, w), dtype)


def _mxu_strip(body: str) -> int:
    """Default preferred strip rows per body: the interleaved-dot mxu
    modes ('two'/'fused') prefer ty=480 (tyw=512, a 256-multiple) so
    the banded lane passes need no 128-multiple sublane padding;
    everything else keeps the measured 256 default."""
    if body == "mxu":
        from libdwt_tpu.ops import banded

        if banded._mode() != "three":
            return 480
    return 256


#: largest frame (pixels) at which the POLYPHASE synthesis kernels are
#: known to COMPILE: Mosaic OOM-kills its own compiler on them at
#: 4K-class geometry ("tpu_compile_helper subprocess exit signal
#: SIGKILL" after ~20 min, BENCH_NOTES.md round-3) while 2048x2048
#: (4.2 Mpix) compiles fine.  6 Mpix splits the observed good (4.2M)
#: and bad (2144*4096 = 8.8M) points with margin.
POLY_INV_SAFE_PIXELS = 6 * 1024 * 1024


def poly_inv_compile_safe(h: int, w: int) -> bool:
    """True where the polyphase synthesis body is known to compile."""
    return h * w <= POLY_INV_SAFE_PIXELS


def _resolve_inv_body(body: str, wavelet, dtype, shape) -> str:
    """Inverse-kernel body choice.  ``'auto'`` keeps the exact VPU
    polyphase body (round-trip ~1e-5) wherever it compiles and resolves
    to the MXU banded-matmul body (bf16-split, round-trip ~2e-4..5e-4)
    only for float32 at the 4K-class geometries where Mosaic OOM-kills
    its compiler on the polyphase synthesis (see
    :data:`POLY_INV_SAFE_PIXELS`); integers always need the bit-exact
    polyphase body."""
    if body == "auto":
        from libdwt_tpu.ops.banded import mxu_supported

        h, w = shape
        if not poly_inv_compile_safe(h, w) and mxu_supported(wavelet, dtype):
            return "mxu"
        return "poly"
    return body


def _fix_strip(t, i: int, meta):
    """Channel-domain border mirrors for inverse strip ``i`` of a band
    described by ``meta = (total, stride, tyw, is_low)`` — the virt2real
    rules of /root/reference/src/dwt-sym.c:434-534 applied in the
    channel domain: row-low bands ('s') mirror whole-point at the head
    and repeat at the tail, row-high bands ('d') the reverse."""
    total, stride, tyw, is_low = meta
    want_lo = i * stride - TOP
    if i == 0:
        t = (_mirror_head_sub(t, TOP, CFIX) if is_low
             else _mirror_head_sub_repeat(t, TOP, CFIX))
    if i * stride + stride + CFIX > total:
        er = (total - 1) - want_lo
        _require(er + CFIX <= tyw - 1,
                 f"strip {i}: tail mirror past buffer (er={er}, tyw={tyw})")
        t = (_mirror_tail_sub_repeat(t, er, CFIX) if is_low
             else _mirror_tail_sub(t, er, CFIX))
    return t


def _tail_rem(h: int, ty: int) -> int:
    """Rows of the last strip."""
    ny = -(-h // ty)
    return h - (ny - 1) * ty


def tail_aligned(h: int, ty: int) -> bool:
    """Mosaic requires DMA slice lengths on the sublane axis to be
    8-aligned; the streamed kernels' stage-buffer slices for the LAST
    strip are rem, rem/2 and rem/4 rows (full / half / quarter
    resolution), so the last-strip remainder must be 32-divisible
    (observed on hardware: a 536-row image, rem=24, k=12 ->
    "Slice shape along dimension 1 must be aligned to tiling (8)")."""
    return _tail_rem(h, ty) % 32 == 0


def streamed_supported(shape, wavelet, strip_rows: int, levels: int = 1) -> bool:
    """Geometry gate: even dims (divisible by 4 for the 2-level pair),
    at least two strips, at most MAX_STRIPS, 32-aligned last strip
    (:func:`tail_aligned` — a Mosaic DMA constraint), symmetric-step
    wavelet."""
    from libdwt_tpu.ops.fused import fused_supported

    h, w = shape
    div = 4 if levels == 2 else 2
    if h % div or w % div or not fused_supported(wavelet):
        return False
    ty = pick_strip(h, strip_rows or 256)
    ny = -(-h // ty)
    if not (2 <= ny <= MAX_STRIPS and h > ty + 48 and tail_aligned(h, ty)):
        return False
    # the 2-level INVERSE also needs its quarter-resolution channel
    # windows to fit: cy2 > qy + 16 (+8 short-tail bump)
    return levels == 1 or h // 4 > ty // 4 + 24


def _require_tail_aligned(h: int, ty: int, interpret: bool) -> None:
    """Compiled-path guard for :func:`tail_aligned` (interpret mode has
    no tiling constraint, and the ragged geometries are valuable test
    coverage there)."""
    if not interpret and not tail_aligned(h, ty):
        raise ValueError(
            f"streamed kernel geometry: last strip of {_tail_rem(h, ty)} "
            "rows is not 32-aligned (Mosaic DMA slice constraint); use "
            "the fused or separable path"
        )


# --------------------------------------------------------------- forward


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "boundary_rows"))
def streamed_dwt2_level(
    x: jax.Array,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    boundary_rows: str = "mirror",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-level forward 2-D DWT -> (LL, HL, LH, HH); even h, w.

    Equivalent to :func:`libdwt_tpu.ops.separable.dwt2_level`.

    ``boundary_rows='extended'`` means the caller already supplied TOP
    (8) valid rows above and below the image (x has h+2*TOP rows) — the
    sharded halo-exchange case (parallel/sharded.py) — so no row
    mirror fills are emitted; columns still mirror in-lane.  The
    extension is TOP deep (not the analysis support radius HALO=4) so
    every strip DMA window keeps 8-aligned sublane offsets and lengths:
    with E=TOP the source start is exactly i*ty — a 4-row extension
    shifted every window to 4 mod 8, the same Mosaic constraint
    :func:`tail_aligned` guards (ADVICE r04).
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if boundary_rows not in ("mirror", "extended"):
        raise ValueError("boundary_rows must be 'mirror' or 'extended'")
    ext_mode = boundary_rows == "extended"
    E = TOP if ext_mode else 0
    h = x.shape[0] - 2 * E
    w = x.shape[1]
    if h % 2 or w % 2:
        raise ValueError("streamed kernel needs even dims; use the oracle")
    total_in = h + 2 * E
    ty = pick_strip(h, strip_rows or 256)
    ny = -(-h // ty)
    rem = h - (ny - 1) * ty
    # +8 tail margin when a short last strip pushes the PENULTIMATE
    # strip's mirror fill past the ty+15 buffer row
    tyw = ty + 2 * TOP + (8 if 0 < rem < TOP else 0)
    if h <= tyw or ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)
    hy = ty // 2

    def kernel(x_hbm, ll_h, hl_h, lh_h, hh_h,
               in_buf, sll, shl, slh, shh, in_sem, out_sem):
        outs = (ll_h, hl_h, lh_h, hh_h)
        stages = (sll, shl, slh, shh)

        def in_dma(i):
            _, s, L, o = _strip_geom(i, total_in, ty, TOP, origin=E)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, L), :],
                in_buf.at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2],
            )

        def out_dma(i, q):
            k = min(ty, h - i * ty) // 2
            return pltpu.make_async_copy(
                stages[q].at[i % 2, pl.ds(0, k), :],
                outs[q].at[pl.ds(i * hy, k), :],
                out_sem.at[i % 2, q],
            )

        in_dma(0).start()
        for i in range(ny):
            if i + 1 < ny:
                in_dma(i + 1).start()
            in_dma(i).wait()
            t = in_buf[i % 2]
            want_lo = i * ty - TOP
            if not ext_mode:
                if i == 0:
                    t = _mirror_head_sub(t, TOP, HALO)
                if i * ty + ty + HALO > h:
                    er = (h - 1) - want_lo
                    _require(er + HALO <= tyw - 1,
                             f"strip {i}: tail mirror past buffer "
                             f"(er={er}, tyw={tyw})")
                    t = _mirror_tail_sub(t, er, HALO)
            ll, hl, lh, hh = _analysis2d_poly(t, wavelet, row_edges=(True, True))
            c = TOP // 2
            if i >= 2:
                for q in range(4):
                    out_dma(i - 2, q).wait()
            for q, quad in enumerate((ll, hl, lh, hh)):
                stages[q][i % 2, :] = quad[c : c + hy, :]
            for q in range(4):
                out_dma(i, q).start()
        for i in (ny - 2, ny - 1):
            for q in range(4):
                out_dma(i, q).wait()

    out_sd = tuple(
        jax.ShapeDtypeStruct((h // 2, w // 2), x.dtype) for _ in range(4)
    )
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)),
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((2, tyw, w), x.dtype)]
        + [pltpu.VMEM((2, hy, w // 2), x.dtype)] * 4
        + [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2, 4))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(x)


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "body"))
def streamed_dwt2_2level(
    x: jax.Array,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    body: str = "poly",
):
    """TWO forward levels in one pass over the image (the multi-scale
    fused single-loop of /root/reference/src/dwt-sym-ms.c with manual
    double buffering).  Returns (LL2, (HL2, LH2, HH2), (HL1, LH1, HH1));
    needs h, w divisible by 4.

    ``body='mxu'`` (float only) computes the lifting passes as banded
    matmuls on the MXU (ops/banded.py) instead of VPU polyphase shifts;
    identical semantics up to float reassociation."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    h, w = x.shape
    if h % 4 or w % 4:
        raise ValueError("needs h, w divisible by 4")
    if body == "mxu":
        from libdwt_tpu.ops.banded import mxu_supported

        if not mxu_supported(wavelet, x.dtype):
            raise ValueError("body='mxu' needs a float symmetric wavelet")
    elif body not in ("poly", "_copy"):
        # '_copy' is a TIMING-ONLY control body (wrong math: quadrants
        # are plain slices) measuring the pure stream floor + DMA /
        # compute overlap; the underscore keeps it out of typo reach —
        # never reachable from dispatch
        raise ValueError(f"unknown kernel body {body!r}")
    TOP2 = 16  # level-1 keeps an 8-row channel halo above every strip
    ty = pick_strip(h, strip_rows or _mxu_strip(body))
    ny = -(-h // ty)
    rem = h - (ny - 1) * ty
    tyw = ty + 2 * TOP2 + (16 if 0 < rem < TOP2 else 0)
    if h <= tyw or ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)
    hy, qy = ty // 2, ty // 4
    hx, qx = w // 2, w // 4

    n_mats = 0
    if body == "mxu":
        import numpy as np

        from libdwt_tpu.ops.banded import build_fwd2_mats

        mats, mats_meta = build_fwd2_mats(
            h, w, ty, tyw, TOP2, HALO2, wavelet, np.dtype(x.dtype))
        n_mats = len(mats)

    STAGE = [(qy, qx, h // 4)] * 4 + [(hy, hx, h // 2)] * 3

    def kernel(x_hbm, *refs):
        mat_refs = refs[:n_mats]
        refs = refs[n_mats:]
        outs = refs[:7]
        in_buf = refs[7]
        stages = refs[8:15]
        in_sem, out_sem = refs[15], refs[16]

        def in_dma(i):
            _, s, L, o = _strip_geom(i, h, ty, TOP2)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, L), :],
                in_buf.at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2],
            )

        def out_dma(i, q):
            rows, _, total = STAGE[q]
            k = min(total - i * rows, rows)
            return pltpu.make_async_copy(
                stages[q].at[i % 2, pl.ds(0, k), :],
                outs[q].at[pl.ds(i * rows, k), :],
                out_sem.at[i % 2, q],
            )

        in_dma(0).start()
        for i in range(ny):
            if i + 1 < ny:
                in_dma(i + 1).start()
            in_dma(i).wait()
            t = in_buf[i % 2]
            want_lo = i * ty - TOP2
            c = TOP2 // 2
            if i * ty + ty + HALO2 > h:
                er = (h - 1) - want_lo
                _require(er + HALO2 <= tyw - 1,
                         f"strip {i}: tail mirror past buffer "
                         f"(er={er}, tyw={tyw})")
            if want_lo + tyw > h:
                _require(h // 2 - 1 - want_lo // 2 + HALO2 // 2
                         <= tyw // 2 - 1,
                         f"strip {i}: LL tail mirror past buffer")
            if body == "mxu":
                from libdwt_tpu.ops.banded import fwd2_strip_packed

                _zero_dma_gaps(in_buf, i, h, ty, tyw, w, x.dtype, TOP2)
                t = in_buf[i % 2]
                ll2, hl2, lh2, hh2, hl1, lh1, hh1 = fwd2_strip_packed(
                    t, i, mat_refs, mats_meta, upcast=interpret
                )
            elif body == "_copy":
                q4 = (t[: tyw // 4, : w // 4],)
                ll2 = hl2 = lh2 = hh2 = q4[0]
                hl1 = lh1 = hh1 = t[: tyw // 2, : w // 2]
            else:
                if i == 0:
                    t = _mirror_head_sub(t, TOP2, HALO2)
                if i * ty + ty + HALO2 > h:
                    t = _mirror_tail_sub(t, (h - 1) - want_lo, HALO2)
                ll, hl1, lh1, hh1 = _analysis2d_poly(
                    t, wavelet, row_edges=(True, True)
                )
                # level-1 bottom fixup: the oracle extends the LL signal
                # whole-point around its own last sample (same rule as
                # ops/fused._2lvl_kernel's er_ll fix)
                if want_lo + tyw > h:
                    ll = _mirror_tail_sub(
                        ll, h // 2 - 1 - want_lo // 2, HALO2 // 2)
                ll2, hl2, lh2, hh2 = _analysis2d_poly(
                    ll, wavelet, row_edges=(True, True)
                )
            c2 = c // 2
            if i >= 2:
                for q in range(7):
                    out_dma(i - 2, q).wait()
            quads = (ll2[c2 : c2 + qy], hl2[c2 : c2 + qy],
                     lh2[c2 : c2 + qy], hh2[c2 : c2 + qy],
                     hl1[c : c + hy], lh1[c : c + hy], hh1[c : c + hy])
            for q in range(7):
                stages[q][i % 2, :] = quads[q]
            for q in range(7):
                out_dma(i, q).start()
        for i in (ny - 2, ny - 1):
            for q in range(7):
                out_dma(i, q).wait()

    sd4 = jax.ShapeDtypeStruct((h // 4, w // 4), x.dtype)
    sd2 = jax.ShapeDtypeStruct((h // 2, w // 2), x.dtype)
    operands = (x,) + (tuple(jnp.asarray(m) for m in mats)
                       if n_mats else ())
    ll2, hl2, lh2, hh2, hl1, lh1, hh1 = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)] * n_mats,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(7)),
        out_shape=(sd4, sd4, sd4, sd4, sd2, sd2, sd2),
        scratch_shapes=[pltpu.VMEM((2, tyw, w), x.dtype)]
        + [pltpu.VMEM((2, qy, qx), x.dtype)] * 4
        + [pltpu.VMEM((2, hy, hx), x.dtype)] * 3
        + [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2, 7))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(*operands)
    return ll2, (hl2, lh2, hh2), (hl1, lh1, hh1)


# --------------------------------------------------------------- inverse


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "boundary_rows"))
def streamed_idwt2_level(
    ll, hl, lh, hh,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    boundary_rows: str = "mirror",
) -> jax.Array:
    """Single-level inverse (inverse of :func:`streamed_dwt2_level`).

    Reads the raw band arrays in place: channel-domain border mirrors
    (the virt2real rules of /root/reference/src/dwt-sym.c:434-534 in
    the channel domain) are materialized in VMEM on edge strips only.

    ``boundary_rows='extended'`` means every band carries TOP (8) valid
    channel-halo rows above and below (the sharded channel exchange,
    parallel/sharded.py), so no channel mirrors are emitted.  TOP deep
    (not the synthesis fix radius CMIR=4) so every band DMA window
    keeps 8-aligned sublane offsets/lengths — see the forward kernel's
    note (ADVICE r04).
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if boundary_rows not in ("mirror", "extended"):
        raise ValueError("boundary_rows must be 'mirror' or 'extended'")
    ext_mode = boundary_rows == "extended"
    E = TOP if ext_mode else 0
    cy = ll.shape[0] - 2 * E
    cx = ll.shape[1]
    h, w = 2 * cy, 2 * cx
    total_in = cy + 2 * E
    for name, band in (("hl", hl), ("lh", lh), ("hh", hh)):
        if band.shape != ll.shape:
            raise ValueError(
                f"streamed inverse needs equal band shapes (even dims): "
                f"ll={ll.shape} vs {name}={band.shape}; use the oracle"
            )
    ty = pick_strip(h, strip_rows or 256)
    ny = -(-h // ty)
    hy = ty // 2
    tyw = hy + 2 * TOP
    if cy <= tyw or ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)

    def kernel(ll_h, hl_h, lh_h, hh_h, out_h,
               bll, bhl, blh, bhh, ostage, in_sem, out_sem):
        bands_h = (ll_h, hl_h, lh_h, hh_h)
        bufs = (bll, bhl, blh, bhh)

        def in_dma(i, q):
            _, s, L, o = _strip_geom(i, total_in, hy, TOP, origin=E)
            return pltpu.make_async_copy(
                bands_h[q].at[pl.ds(s, L), :],
                bufs[q].at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2, q],
            )

        def out_dma(i):
            k = min(h - i * ty, ty)
            return pltpu.make_async_copy(
                ostage.at[i % 2, pl.ds(0, k), :],
                out_h.at[pl.ds(i * ty, k), :],
                out_sem.at[i % 2],
            )

        for q in range(4):
            in_dma(0, q).start()
        for i in range(ny):
            if i + 1 < ny:
                for q in range(4):
                    in_dma(i + 1, q).start()
            for q in range(4):
                in_dma(i, q).wait()
            want_lo = i * hy - TOP
            fixed = []
            for q, buf in enumerate(bufs):
                is_low = q < 2  # ll/hl are row-low 's'; lh/hh row-high 'd'
                t = buf[i % 2]
                if not ext_mode:
                    if i == 0:
                        t = (_mirror_head_sub(t, TOP, CMIR) if is_low
                             else _mirror_head_sub_repeat(t, TOP, CMIR))
                    if i * hy + hy + CMIR > cy:
                        er = (cy - 1) - want_lo
                        _require(er + CMIR <= tyw - 1,
                                 f"strip {i}: tail mirror past buffer "
                                 f"(er={er}, tyw={tyw})")
                        t = (_mirror_tail_sub_repeat(t, er, CMIR) if is_low
                             else _mirror_tail_sub(t, er, CMIR))
                fixed.append(t)
            t = _synthesis2d_poly(*fixed, wavelet, row_edges=(True, True))
            if i >= 2:
                out_dma(i - 2).wait()
            ostage[i % 2, :] = t[2 * TOP : 2 * TOP + ty, :]
            out_dma(i).start()
        for i in (ny - 2, ny - 1):
            out_dma(i).wait()

    out_sd = jax.ShapeDtypeStruct((h, w), ll.dtype)
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((2, tyw, cx), ll.dtype)] * 4
        + [pltpu.VMEM((2, ty, w), ll.dtype),
           pltpu.SemaphoreType.DMA((2, 4)),
           pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(ll, hl, lh, hh)


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "body"))
def streamed_idwt2_2level(
    ll2, bands2, bands1,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    body: str = "auto",
) -> jax.Array:
    """TWO reconstruction levels in one pass (inverse of
    :func:`streamed_dwt2_2level`); needs h, w divisible by 4.

    ``body='mxu'`` (float only) runs the synthesis lifting as banded
    matmuls on the MXU (ops/banded.py); the per-band channel-mirror
    fixes stay on the VPU.  Default 'auto' keeps the exact VPU
    polyphase body below POLY_INV_SAFE_PIXELS and resolves to the
    bf16-split MXU body only at the 4K-class float32 geometries where
    Mosaic cannot compile the polyphase synthesis (see
    :func:`_resolve_inv_body`)."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    hl2, lh2, hh2 = bands2
    hl1, lh1, hh1 = bands1
    h = hl1.shape[-2] + lh1.shape[-2]
    w = hl1.shape[-1] + lh1.shape[-1]
    if h % 4 or w % 4:
        raise ValueError("needs h, w divisible by 4")
    body = _resolve_inv_body(body, wavelet, ll2.dtype, (h, w))
    if body == "mxu":
        from libdwt_tpu.ops.banded import mxu_supported

        if not mxu_supported(wavelet, ll2.dtype):
            raise ValueError("body='mxu' needs a float32 symmetric wavelet")
    elif body != "poly":
        raise ValueError(f"unknown kernel body {body!r}")
    ty = pick_strip(h, strip_rows or _mxu_strip(body))
    ny = -(-h // ty)
    hy, qy = ty // 2, ty // 4
    hx, qx = w // 2, w // 4
    cy1, cy2 = h // 2, h // 4
    remh = cy1 - (ny - 1) * hy
    remq = cy2 - (ny - 1) * qy
    tyw_h = hy + 2 * TOP + (8 if 0 < remh < CFIX else 0)
    tyw_q = qy + 2 * TOP + (8 if 0 < remq < CFIX else 0)
    if cy1 <= tyw_h or cy2 <= tyw_q or ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)

    n_mats = 0
    if body == "mxu":
        import numpy as np

        from libdwt_tpu.ops.banded import build_inv_mats

        (m2c, m2l), (meta2c, meta2l) = build_inv_mats(
            2 * tyw_q, w // 2, wavelet, np.dtype(ll2.dtype))
        (m1c, m1l), (meta1c, meta1l) = build_inv_mats(
            2 * tyw_h, w, wavelet, np.dtype(ll2.dtype))
        mats = (m2c, m2l, m1c, m1l)
        n_mats = len(mats)

    META = [(cy2, qy, tyw_q, True), (cy2, qy, tyw_q, True),
            (cy2, qy, tyw_q, False), (cy2, qy, tyw_q, False),
            (cy1, hy, tyw_h, True), (cy1, hy, tyw_h, False),
            (cy1, hy, tyw_h, False)]

    def kernel(*refs):
        mat_refs = refs[:n_mats]
        refs = refs[n_mats:]
        bands_h = refs[:7]
        out_h = refs[7]
        bufs = refs[8:15]
        ostage, in_sem, out_sem = refs[15], refs[16], refs[17]

        def in_dma(i, q):
            _, s, L, o = _strip_geom(i, META[q][0], META[q][1])
            return pltpu.make_async_copy(
                bands_h[q].at[pl.ds(s, L), :],
                bufs[q].at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2, q],
            )

        def out_dma(i):
            k = min(h - i * ty, ty)
            return pltpu.make_async_copy(
                ostage.at[i % 2, pl.ds(0, k), :],
                out_h.at[pl.ds(i * ty, k), :],
                out_sem.at[i % 2],
            )

        for q in range(7):
            in_dma(0, q).start()
        for i in range(ny):
            if i + 1 < ny:
                for q in range(7):
                    in_dma(i + 1, q).start()
            for q in range(7):
                in_dma(i, q).wait()
            if body == "mxu":
                from libdwt_tpu.ops.banded import synthesis2d_packed

                for q in range(7):
                    _zero_dma_gaps(bufs[q], i, META[q][0], META[q][1],
                                   META[q][2], bands_h[q].shape[-1],
                                   ll2.dtype)
            l2, x2, y2, z2 = (
                _fix_strip(bufs[q][i % 2], i, META[q]) for q in range(4)
            )
            if body == "mxu":
                t2 = synthesis2d_packed(l2, x2, y2, z2, mat_refs[0],
                                        meta2c, mat_refs[1], meta2l,
                                        upcast=interpret)
            else:
                t2 = _synthesis2d_poly(l2, x2, y2, z2, wavelet,
                                       row_edges=(True, True))
            # LL1 rows [i*hy - TOP, ...) start at t2 row TOP: t2's row
            # for LL1 row r is 2*(r - want_lo_q) with want_lo_q =
            # i*qy - TOP, so r = i*hy - TOP lands at row TOP.
            ll1 = t2[TOP : TOP + tyw_h, :]
            # LL1 bottom fixup: reconstruction past the image edge must
            # follow the level-1 channel repeat mirror s[N+m] = s[N-1-m]
            if i * hy + hy + CFIX > cy1:
                er1 = (cy1 - 1) - (i * hy - TOP)
                _require(er1 + CFIX <= tyw_h - 1,
                         f"strip {i}: LL1 tail mirror past buffer "
                         f"(er1={er1}, tyw_h={tyw_h})")
                ll1 = _mirror_tail_sub_repeat(ll1, er1, CFIX)
            b1 = [_fix_strip(bufs[q][i % 2], i, META[q]) for q in range(4, 7)]
            if body == "mxu":
                t1 = synthesis2d_packed(ll1, *b1, mat_refs[2], meta1c,
                                        mat_refs[3], meta1l,
                                        upcast=interpret)
            else:
                t1 = _synthesis2d_poly(ll1, *b1, wavelet,
                                       row_edges=(True, True))
            if i >= 2:
                out_dma(i - 2).wait()
            ostage[i % 2, :] = t1[2 * TOP : 2 * TOP + ty, :]
            out_dma(i).start()
        for i in (ny - 2, ny - 1):
            out_dma(i).wait()

    out_sd = jax.ShapeDtypeStruct((h, w), ll2.dtype)
    operands = ((tuple(jnp.asarray(m) for m in mats) if n_mats else ())
                + (ll2, hl2, lh2, hh2, hl1, lh1, hh1))
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)] * n_mats
        + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((2, tyw_q, qx), ll2.dtype)] * 4
        + [pltpu.VMEM((2, tyw_h, hx), ll2.dtype)] * 3
        + [pltpu.VMEM((2, ty, w), ll2.dtype),
           pltpu.SemaphoreType.DMA((2, 7)),
           pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(*operands)


# --------------------------------------------------------------- pyramids


def streamed_wavedec2(x, wavelet="cdf97", level: int = 1,
                      strip_rows: int = 0, interpret: bool = False,
                      body: str = "poly"):
    """Multi-level MRA: streamed 2-level kernels while geometry allows,
    then the fused/XLA tail of :func:`ops.fused.fused_wavedec2`.  Same
    pytree as wavedec2.  ``body`` selects the strip compute body
    ('poly' VPU polyphase / 'mxu' banded matmuls, float only)."""
    from libdwt_tpu.ops.fused import fused_wavedec2

    if (
        x.ndim == 2
        and level >= 3
        and streamed_deep_ok(x.shape, x.dtype.itemsize, wavelet, level,
                             strip_rows)
    ):
        # whole pyramid in one launch: levels 1-2 streamed, the tail on
        # the VMEM-resident LL2
        return streamed_wavedec2_deep(
            x, wavelet, level, strip_rows=strip_rows, interpret=interpret,
            body=body,
        )
    coeffs = []
    ll = x
    remaining = level
    while remaining >= 2 and ll.ndim == 2 and streamed_supported(
        ll.shape, wavelet, strip_rows, levels=2
    ):
        ll, b2, b1 = streamed_dwt2_2level(
            ll, wavelet, strip_rows=strip_rows, interpret=interpret,
            body=body,
        )
        coeffs.append(b1)
        coeffs.append(b2)
        remaining -= 2
    if remaining:
        rest = fused_wavedec2(ll, wavelet, remaining, interpret=interpret)
        ll = rest[0]
        coeffs.extend(rest[:0:-1])
    return [ll] + coeffs[::-1]


def streamed_waverec2(coeffs, wavelet="cdf97", strip_rows: int = 0,
                      interpret: bool = False, body: str = "auto"):
    """Inverse of :func:`streamed_wavedec2` (accepts any wavedec2
    pytree): streamed 2-level inverses from the coarse end down, with
    the fused/XLA tail for small or odd-geometry levels.  ``body``
    selects the strip synthesis body ('poly' VPU polyphase / 'mxu'
    banded matmuls, float32 only; default 'auto' keeps poly below
    POLY_INV_SAFE_PIXELS and falls to mxu only at 4K-class float32
    geometry, see :func:`_resolve_inv_body`)."""
    from libdwt_tpu.ops.fused import fused_waverec2

    if len(coeffs) >= 4 and coeffs[0].ndim == 2:
        # whole reconstruction in one launch when the geometry allows
        # (raises at trace time otherwise — fall through to the level
        # loop)
        try:
            return streamed_waverec2_deep(
                coeffs, wavelet, strip_rows=strip_rows, interpret=interpret,
                body=body,
            )
        except ValueError:
            pass
    ll = coeffs[0]
    rest = list(coeffs[1:])
    # coarse levels (small) run on the fused/XLA path until the
    # streamed geometry is worthwhile
    while rest:
        if len(rest) >= 2:
            b2, b1 = rest[0], rest[1]
            h = b1[0].shape[-2] + b1[1].shape[-2]
            w = b1[0].shape[-1] + b1[1].shape[-1]
            full = (
                ll.ndim == 2
                and streamed_supported((h, w), wavelet, strip_rows, levels=2)
                and ll.shape == b2[0].shape
                and all(b.shape == b2[0].shape for b in b2)
                and all(b.shape == (h // 2, w // 2) for b in b1)
            )
            if full:
                ll = streamed_idwt2_2level(
                    ll, b2, b1, wavelet, strip_rows=strip_rows,
                    interpret=interpret, body=body,
                )
                rest = rest[2:]
                continue
        ll = fused_waverec2([ll, rest[0]], wavelet, interpret=interpret)
        rest = rest[1:]
    return ll


# ----------------------------------------------- whole pyramid, one launch


def streamed_deep_ok(shape, dtype_itemsize: int, wavelet, level: int,
                     strip_rows: int = 0) -> bool:
    """Geometry gate for :func:`streamed_wavedec2_deep`: the streamed
    2-level gate, level >= 3, LL2 (h/4 x w/4) small enough to live in
    VMEM through the deep tail, and enough samples for the tail."""
    h, w = shape
    if level < 3 or not streamed_supported(shape, wavelet, strip_rows, 2):
        return False
    qh, qw = h // 4, w // 4
    if (qh + 8) * (qw + 8) * dtype_itemsize > _DEEP_VMEM_LIMIT:
        return False
    return min(qh, qw) >> (level - 3) > 2 * HALO


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "level", "strip_rows", "interpret", "body"))
def streamed_wavedec2_deep(
    x: jax.Array,
    wavelet="cdf97",
    level: int = 3,
    strip_rows: int = 0,
    interpret: bool = False,
    body: str = "poly",
):
    """The ENTIRE multi-level pyramid in ONE kernel launch: levels 1-2
    stream through double-buffered strips (exactly
    :func:`streamed_dwt2_2level`) while LL2 accumulates in a persistent
    VMEM buffer; the remaining ``level - 2`` levels then run on that
    buffer in-kernel (the deep-pyramid tail of
    :func:`libdwt_tpu.ops.fused.fused_deep_wavedec2`), so the frame is
    read from HBM once and the LL2 round trip disappears.  Returns the
    wavedec2 pytree.  Float path only gates on geometry; integers work
    identically (bit-exact)."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    h, w = x.shape
    if level < 3:
        raise ValueError("use streamed_dwt2_2level for level <= 2")
    if h % 4 or w % 4:
        raise ValueError("needs h, w divisible by 4")
    if body == "mxu":
        from libdwt_tpu.ops.banded import mxu_supported

        if not mxu_supported(wavelet, x.dtype):
            raise ValueError("body='mxu' needs a float symmetric wavelet")
    elif body not in ("poly", "_copy"):
        # '_copy' is a TIMING-ONLY control body (wrong math: quadrants
        # are plain slices) measuring the pure stream floor + DMA /
        # compute overlap; the underscore keeps it out of typo reach —
        # never reachable from dispatch
        raise ValueError(f"unknown kernel body {body!r}")
    deep_levels = level - 2
    TOP2 = 16
    ty = pick_strip(h, strip_rows or _mxu_strip(body))
    ny = -(-h // ty)
    rem = h - (ny - 1) * ty
    tyw = ty + 2 * TOP2 + (16 if 0 < rem < TOP2 else 0)
    if h <= tyw or ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)
    hy, qy = ty // 2, ty // 4
    hx, qx = w // 2, w // 4
    cy2, cx2 = h // 4, w // 4
    if (cy2 + 8) * (cx2 + 8) * x.dtype.itemsize > _DEEP_VMEM_LIMIT:
        raise ValueError("LL2 too large to hold the deep tail in VMEM")
    if min(cy2, cx2) >> (deep_levels - 1) <= 2 * HALO:
        raise ValueError("too many levels for this size")

    # deep-tail output shapes (per level: hl, lh, hh; then the final LL)
    deep_shapes = []
    ch, cw = cy2, cx2
    for _ in range(deep_levels):
        cy_, cx_ = -(-ch // 2), -(-cw // 2)
        fy_, fx_ = ch // 2, cw // 2
        deep_shapes.append(((cy_, fx_), (fy_, cx_), (fy_, fx_)))
        ch, cw = cy_, cx_
    n_deep = 3 * deep_levels + 1

    n_mats = 0
    if body == "mxu":
        import numpy as np

        from libdwt_tpu.ops.banded import build_fwd2_mats

        mats, mats_meta = build_fwd2_mats(
            h, w, ty, tyw, TOP2, HALO2, wavelet, np.dtype(x.dtype))
        n_mats = len(mats)

    STAGE = [(qy, qx, h // 4)] * 3 + [(hy, hx, h // 2)] * 3

    def kernel(x_hbm, *refs):
        mat_refs = refs[:n_mats]
        refs = refs[n_mats:]
        strip_outs = refs[:6]           # hl2, lh2, hh2, hl1, lh1, hh1 (ANY)
        deep_outs = refs[6 : 6 + n_deep]  # VMEM
        in_buf = refs[6 + n_deep]
        stages = refs[7 + n_deep : 13 + n_deep]
        ll2_buf = refs[13 + n_deep]
        in_sem, out_sem = refs[14 + n_deep], refs[15 + n_deep]

        def in_dma(i):
            _, s, L, o = _strip_geom(i, h, ty, TOP2)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, L), :],
                in_buf.at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2],
            )

        def out_dma(i, q):
            rows, _, total = STAGE[q]
            k = min(total - i * rows, rows)
            return pltpu.make_async_copy(
                stages[q].at[i % 2, pl.ds(0, k), :],
                strip_outs[q].at[pl.ds(i * rows, k), :],
                out_sem.at[i % 2, q],
            )

        in_dma(0).start()
        for i in range(ny):
            if i + 1 < ny:
                in_dma(i + 1).start()
            in_dma(i).wait()
            t = in_buf[i % 2]
            want_lo = i * ty - TOP2
            c = TOP2 // 2
            if i * ty + ty + HALO2 > h:
                er = (h - 1) - want_lo
                _require(er + HALO2 <= tyw - 1,
                         f"strip {i}: tail mirror past buffer "
                         f"(er={er}, tyw={tyw})")
            if want_lo + tyw > h:
                _require(h // 2 - 1 - want_lo // 2 + HALO2 // 2
                         <= tyw // 2 - 1,
                         f"strip {i}: LL tail mirror past buffer")
            if body == "mxu":
                from libdwt_tpu.ops.banded import fwd2_strip_packed

                _zero_dma_gaps(in_buf, i, h, ty, tyw, w, x.dtype, TOP2)
                t = in_buf[i % 2]
                ll2, hl2, lh2, hh2, hl1, lh1, hh1 = fwd2_strip_packed(
                    t, i, mat_refs, mats_meta, upcast=interpret
                )
            elif body == "_copy":
                q4 = (t[: tyw // 4, : w // 4],)
                ll2 = hl2 = lh2 = hh2 = q4[0]
                hl1 = lh1 = hh1 = t[: tyw // 2, : w // 2]
            else:
                if i == 0:
                    t = _mirror_head_sub(t, TOP2, HALO2)
                if i * ty + ty + HALO2 > h:
                    t = _mirror_tail_sub(t, (h - 1) - want_lo, HALO2)
                ll, hl1, lh1, hh1 = _analysis2d_poly(
                    t, wavelet, row_edges=(True, True)
                )
                if want_lo + tyw > h:
                    ll = _mirror_tail_sub(
                        ll, h // 2 - 1 - want_lo // 2, HALO2 // 2)
                ll2, hl2, lh2, hh2 = _analysis2d_poly(
                    ll, wavelet, row_edges=(True, True)
                )
            c2 = c // 2
            if i >= 2:
                for q in range(6):
                    out_dma(i - 2, q).wait()
            quads = (hl2[c2 : c2 + qy], lh2[c2 : c2 + qy],
                     hh2[c2 : c2 + qy],
                     hl1[c : c + hy], lh1[c : c + hy], hh1[c : c + hy])
            for q in range(6):
                stages[q][i % 2, :] = quads[q]
            for q in range(6):
                out_dma(i, q).start()
            # LL2 kept rows accumulate in the persistent VMEM buffer
            kq = min(cy2 - i * qy, qy)
            ll2_buf[pl.ds(i * qy, kq), :] = ll2[c2 : c2 + kq, :]
        for i in (ny - 2, ny - 1):
            for q in range(6):
                out_dma(i, q).wait()

        # ---- deep tail: remaining levels on the VMEM-resident LL2
        # (the fused_deep_wavedec2 body)
        cur = ll2_buf[:]
        drefs = list(deep_outs)
        ch_, cw_ = cy2, cx2
        for _ in range(deep_levels):
            # cur's shape is exactly (ch_, cw_) every iteration: it
            # starts as the (cy2, cx2) buffer and each pass ends with
            # the [:cy_, :cx_] slice that becomes the next (ch_, cw_)
            ext = _mirror_ext2(cur, HALO)
            ext = _lift_interleaved(ext, wavelet, axis=1, inverse=False)
            ext = _lift_interleaved(ext, wavelet, axis=0, inverse=False)
            ext = _scale_interleaved(ext, wavelet, inverse=False)
            che, cwe = ch_ + ch_ % 2, cw_ + cw_ % 2
            v = ext[HALO : HALO + che, HALO : HALO + cwe]
            a, b = _deint_sub(v)
            llT, hlT = _deint_sub(a.T)
            lhT, hhT = _deint_sub(b.T)
            cy_, cx_ = -(-ch_ // 2), -(-cw_ // 2)
            fy_, fx_ = ch_ // 2, cw_ // 2
            drefs.pop(0)[:] = hlT.T[:cy_, :fx_]
            drefs.pop(0)[:] = lhT.T[:fy_, :cx_]
            drefs.pop(0)[:] = hhT.T[:fy_, :fx_]
            cur = llT.T[:cy_, :cx_]
            ch_, cw_ = cy_, cx_
        drefs.pop(0)[:] = cur

    sd4 = jax.ShapeDtypeStruct((h // 4, w // 4), x.dtype)
    sd2 = jax.ShapeDtypeStruct((h // 2, w // 2), x.dtype)
    deep_sd = []
    for (hs, ls, hhs) in deep_shapes:
        deep_sd += [jax.ShapeDtypeStruct(hs, x.dtype),
                    jax.ShapeDtypeStruct(ls, x.dtype),
                    jax.ShapeDtypeStruct(hhs, x.dtype)]
    ch, cw = cy2, cx2
    for _ in range(deep_levels):
        ch, cw = -(-ch // 2), -(-cw // 2)
    deep_sd.append(jax.ShapeDtypeStruct((ch, cw), x.dtype))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    operands = (x,) + (tuple(jnp.asarray(m) for m in mats)
                       if n_mats else ())
    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vspec] * n_mats,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 6
                        + [vspec] * n_deep),
        out_shape=tuple([sd4] * 3 + [sd2] * 3 + deep_sd),
        scratch_shapes=[pltpu.VMEM((2, tyw, w), x.dtype)]
        + [pltpu.VMEM((2, qy, qx), x.dtype)] * 3
        + [pltpu.VMEM((2, hy, hx), x.dtype)] * 3
        + [pltpu.VMEM((cy2, cx2), x.dtype),
           pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2, 6))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(*operands)
    hl2, lh2, hh2, hl1, lh1, hh1 = outs[:6]
    deep = outs[6:]
    coeffs = [deep[-1]]
    for lvl in range(deep_levels - 1, -1, -1):
        coeffs.append(tuple(deep[3 * lvl : 3 * lvl + 3]))
    coeffs.append((hl2, lh2, hh2))
    coeffs.append((hl1, lh1, hh1))
    return coeffs


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_rows", "interpret", "body"))
def streamed_waverec2_deep(
    coeffs,
    wavelet="cdf97",
    strip_rows: int = 0,
    interpret: bool = False,
    body: str = "auto",
) -> jax.Array:
    """The ENTIRE multi-level reconstruction in ONE kernel launch
    (inverse of :func:`streamed_wavedec2_deep`): the deep tail
    reconstructs LL2 in VMEM (the fused_deep_waverec2 body), the
    level-2+1 strips then stream out double-buffered — the LL2 band
    never touches HBM and the frame is written once.

    ``body='mxu'`` (float only) runs the STRIP synthesis lifting as
    banded matmuls on the MXU (ops/banded.py); the small deep tail and
    the channel-mirror fixes stay on the VPU.  Default 'auto' keeps
    poly below POLY_INV_SAFE_PIXELS and falls to mxu only at 4K-class
    float32 geometry (see :func:`_resolve_inv_body`)."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    levels = len(coeffs) - 1
    if levels < 3:
        raise ValueError("use streamed_idwt2_2level for 2 levels")
    hl1, lh1, hh1 = coeffs[-1]
    hl2, lh2, hh2 = coeffs[-2]
    h = hl1.shape[-2] + lh1.shape[-2]
    w = hl1.shape[-1] + lh1.shape[-1]
    if h % 4 or w % 4:
        raise ValueError("needs h, w divisible by 4")
    cy1, cx1 = h // 2, w // 2
    cy2, cx2 = h // 4, w // 4
    for name, band, shp in (
        ("hl2", hl2, (cy2, cx2)), ("lh2", lh2, (cy2, cx2)),
        ("hh2", hh2, (cy2, cx2)), ("hl1", hl1, (cy1, cx1)),
        ("lh1", lh1, (cy1, cx1)), ("hh1", hh1, (cy1, cx1)),
    ):
        if band.shape != shp:
            raise ValueError(
                f"streamed deep inverse: band {name} has shape "
                f"{band.shape}, expected {shp}"
            )
    if (cy2 + 8) * (cx2 + 8) * hl1.dtype.itemsize > _DEEP_VMEM_LIMIT:
        raise ValueError("LL2 too large to hold the deep tail in VMEM")
    # deep reconstruction shapes, coarse first, ending at LL2's size
    sizes = [(cy2, cx2)]
    ch, cw = cy2, cx2
    for _ in range(levels - 2 - 1):
        ch, cw = -(-ch // 2), -(-cw // 2)
        sizes.append((ch, cw))
    deep_shapes = sizes[::-1]  # reconstruct smallest -> LL2
    deep_bands = coeffs[1 : levels - 1]  # coarse-level triples
    # validate the coarse pytree before any of it is DMA'd: the wavedec2
    # ceil/floor halving geometry, coarse first
    ll_shape = (-(-ch // 2), -(-cw // 2))
    if coeffs[0].shape != ll_shape:
        raise ValueError(
            f"streamed deep inverse: LL has shape {coeffs[0].shape}, "
            f"expected {ll_shape}"
        )
    if min(ll_shape) <= CH:
        # _pad_ch_static's channel mirror slices up to row CH
        raise ValueError(
            f"coarsest LL {ll_shape} too small for the deep tail's "
            f"channel mirrors (needs > {CH} samples per axis)"
        )
    for triple, (th, tw) in zip(deep_bands, deep_shapes):
        want = ((-(-th // 2), tw // 2), (th // 2, -(-tw // 2)),
                (th // 2, tw // 2))
        got = tuple(b.shape for b in triple)
        if got != want:
            raise ValueError(
                f"streamed deep inverse: coarse triple shapes {got} do "
                f"not match the {th}x{tw} level ({want})"
            )

    body = _resolve_inv_body(body, wavelet, hl1.dtype, (h, w))
    ty = pick_strip(h, strip_rows or _mxu_strip(body))
    ny = -(-h // ty)
    hy, qy = ty // 2, ty // 4
    tyw_h = hy + 2 * TOP
    tyw_q = qy + 2 * TOP
    if ny < 2 or ny > MAX_STRIPS:
        raise ValueError("geometry outside the streamed kernel's range")
    _require_tail_aligned(h, ty, interpret)
    # +8 tail margins when a short last strip pushes the penultimate
    # strip's channel mirror past the buffer (same rule as
    # streamed_idwt2_2level)
    remh = cy1 - (ny - 1) * hy
    if 0 < remh < CFIX:
        tyw_h += 8
    remq = cy2 - (ny - 1) * qy
    bump_q = 8 if 0 < remq < CFIX else 0
    tyw_q += bump_q

    if body == "mxu":
        import numpy as np

        from libdwt_tpu.ops.banded import build_inv_mats, mxu_supported

        if not mxu_supported(wavelet, hl1.dtype):
            raise ValueError("body='mxu' needs a float32 symmetric wavelet")
        (m2c, m2l), (meta2c, meta2l) = build_inv_mats(
            2 * tyw_q, w // 2, wavelet, np.dtype(hl1.dtype))
        (m1c, m1l), (meta1c, meta1l) = build_inv_mats(
            2 * tyw_h, w, wavelet, np.dtype(hl1.dtype))
        mats = (m2c, m2l, m1c, m1l)
        n_mats = len(mats)
    elif body != "poly":
        raise ValueError(f"unknown kernel body {body!r}")
    else:
        n_mats = 0

    n_deep_in = 1 + 3 * (levels - 2)
    # grid-aligned LL2 buffer (+ halos); the q bump grows the last
    # strip's window past ny*qy + 2*TOP
    buf_rows = ny * qy + 2 * TOP + bump_q

    # band metadata for the streamed strips (ll2 comes from VMEM)
    META = [(cy2, qy, tyw_q, True), (cy2, qy, tyw_q, False),
            (cy2, qy, tyw_q, False),
            (cy1, hy, tyw_h, True), (cy1, hy, tyw_h, False),
            (cy1, hy, tyw_h, False)]

    def kernel(*refs):
        mat_refs = refs[:n_mats]
        refs = refs[n_mats:]
        deep_ins = refs[:n_deep_in]              # VMEM (LL_J + triples)
        strip_ins = refs[n_deep_in : n_deep_in + 6]  # ANY
        out_h = refs[n_deep_in + 6]
        ll2p = refs[n_deep_in + 7]
        bufs = refs[n_deep_in + 8 : n_deep_in + 14]
        ostage = refs[n_deep_in + 14]
        in_sem, out_sem = refs[n_deep_in + 15], refs[n_deep_in + 16]

        # ---- deep tail: LL_J + coarse triples -> LL2, all in VMEM
        cur = deep_ins[0][:]
        k = 1
        for (th, tw) in deep_shapes:
            hl = deep_ins[k][:]
            lh = deep_ins[k + 1][:]
            hh = deep_ins[k + 2][:]
            k += 3
            llp = _pad_ch_static(_pad_ch_static(cur, th, True, 0), tw, True, 1)
            hlp = _pad_ch_static(_pad_ch_static(hl, th, True, 0), tw, False, 1)
            lhp = _pad_ch_static(_pad_ch_static(lh, th, False, 0), tw, True, 1)
            hhp = _pad_ch_static(_pad_ch_static(hh, th, False, 0), tw, False, 1)
            t = _synthesis2d_poly(llp, hlp, lhp, hhp, wavelet)
            cur = t[2 * CMIR : 2 * CMIR + th, 2 * CMIR : 2 * CMIR + tw]

        # ---- stage LL2 into the halo-padded strip buffer: top halo via
        # the whole-point channel mirror (s[-m] = s[m]), bottom via the
        # repeat mirror (s[N+m] = s[N-1-m]); one fill for ALL strips.
        # Built with REF STORES, not a zeros+cur concatenate: ``cur``
        # carries a (0, 8) vector-layout offset from its 2*CMIR crop and
        # Mosaic rejects concatenating mixed-offset operands ("offset
        # mismatch on non-concat dimension", seen at the 4K J=5
        # geometry); a store relayouts, a concatenate does not.
        pad_bot = buf_rows - TOP - cy2
        ll2p[pl.ds(0, TOP), :] = jnp.zeros((TOP, cx2), cur.dtype)
        ll2p[pl.ds(TOP, cy2), :] = cur
        ll2p[pl.ds(TOP + cy2, pad_bot), :] = jnp.zeros(
            (pad_bot, cx2), cur.dtype)
        v = ll2p[:]
        v = _mirror_head_sub(v, TOP, CFIX)
        v = _mirror_tail_sub_repeat(v, TOP + cy2 - 1, CFIX)
        ll2p[:] = v

        def in_dma(i, q):
            _, s, L, o = _strip_geom(i, META[q][0], META[q][1])
            return pltpu.make_async_copy(
                strip_ins[q].at[pl.ds(s, L), :],
                bufs[q].at[i % 2, pl.ds(o, L), :],
                in_sem.at[i % 2, q],
            )

        def out_dma(i):
            kk = min(h - i * ty, ty)
            return pltpu.make_async_copy(
                ostage.at[i % 2, pl.ds(0, kk), :],
                out_h.at[pl.ds(i * ty, kk), :],
                out_sem.at[i % 2],
            )

        for q in range(6):
            in_dma(0, q).start()
        for i in range(ny):
            if i + 1 < ny:
                for q in range(6):
                    in_dma(i + 1, q).start()
            for q in range(6):
                in_dma(i, q).wait()
            if body == "mxu":
                from libdwt_tpu.ops.banded import synthesis2d_packed

                for q in range(6):
                    _zero_dma_gaps(bufs[q], i, META[q][0], META[q][1],
                                   META[q][2], strip_ins[q].shape[-1],
                                   hl1.dtype)
            ll2w = ll2p[pl.ds(i * qy, tyw_q), :]
            x2 = _fix_strip(bufs[0][i % 2], i, META[0])
            y2 = _fix_strip(bufs[1][i % 2], i, META[1])
            z2 = _fix_strip(bufs[2][i % 2], i, META[2])
            if body == "mxu":
                t2 = synthesis2d_packed(ll2w, x2, y2, z2, mat_refs[0],
                                        meta2c, mat_refs[1], meta2l,
                                        upcast=interpret)
            else:
                t2 = _synthesis2d_poly(ll2w, x2, y2, z2, wavelet,
                                       row_edges=(True, True))
            ll1 = t2[TOP : TOP + tyw_h, :]
            if i * hy + hy + CFIX > cy1:
                er1 = (cy1 - 1) - (i * hy - TOP)
                _require(er1 + CFIX <= tyw_h - 1,
                         f"strip {i}: LL1 tail mirror past buffer "
                         f"(er1={er1}, tyw_h={tyw_h})")
                ll1 = _mirror_tail_sub_repeat(ll1, er1, CFIX)
            b1 = [_fix_strip(bufs[q][i % 2], i, META[q]) for q in range(3, 6)]
            if body == "mxu":
                t1 = synthesis2d_packed(ll1, *b1, mat_refs[2], meta1c,
                                        mat_refs[3], meta1l,
                                        upcast=interpret)
            else:
                t1 = _synthesis2d_poly(ll1, *b1, wavelet,
                                       row_edges=(True, True))
            if i >= 2:
                out_dma(i - 2).wait()
            ostage[i % 2, :] = t1[2 * TOP : 2 * TOP + ty, :]
            out_dma(i).start()
        for i in (ny - 2, ny - 1):
            out_dma(i).wait()

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    deep_arrs = [coeffs[0]]
    for triple in deep_bands:
        deep_arrs += list(triple)
    out_sd = jax.ShapeDtypeStruct((h, w), hl1.dtype)
    operands = ((tuple(jnp.asarray(m) for m in mats) if n_mats else ())
                + tuple(deep_arrs) + (hl2, lh2, hh2, hl1, lh1, hh1))
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[vspec] * (n_mats + n_deep_in) + [aspec] * 6,
        out_specs=aspec,
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((buf_rows, cx2), hl1.dtype)]
        + [pltpu.VMEM((2, tyw_q, cx2), hl1.dtype)] * 3
        + [pltpu.VMEM((2, tyw_h, cx1), hl1.dtype)] * 3
        + [pltpu.VMEM((2, ty, w), hl1.dtype),
           pltpu.SemaphoreType.DMA((2, 6)),
           pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(*operands)
