"""Banded-matrix (MXU) formulation of the float lifting passes.

The streamed strip kernels are VPU-compute-bound: the polyphase lifting
body costs ~30 vector ops/pixel while the DMA stream alone is ~0.14
ms/frame at 4K (BENCH_NOTES.md).  Lifting is LINEAR, so an entire 1-D
lifting pass (all steps + scaling + the strip's border-mirror fills) is
one banded matrix; applying it as block-banded matmuls moves the
arithmetic to the MXU (395 bf16 Tflop/s measured on v5e vs ~1
Tflop/s-equivalent on the VPU; f32 accuracy via the fused bf16
split-product of :func:`apply_packed`), leaving the VPU only transposes,
polyphase reshapes and staging.  It is also the body that COMPILES for
the big synthesis kernels — Mosaic OOM-kills its compiler on the
polyphase inverse at 4K geometry (BENCH_NOTES.md round-3 findings).

Matrices are built in PURE NUMPY (float64, cast to f32) at trace time —
no eager jnp (CLAUDE.md's dispatch-poisoning landmine) — and cached per
geometry.  Semantics mirror the interleaved lifting of
``ops.fused._poly_lift_ch`` exactly:

  * step ``target='d'`` updates odd rows i: x[i] += wl*x[i-1] + wr*x[i+1]
  * step ``target='s'`` updates even rows the same way
  * whole-point edge semantics (x[-1]=x[1], x[n]=x[n-2]) where enabled
  * forward: steps then per-parity scaling; inverse: inverse scaling
    then reversed, negated steps

so results match the polyphase kernels up to float reassociation
(matmul sums in a different order; the bf16-split path rounds at
~2^-17 relative).  The reference equivalent of this trade is its
accel-type kernel catalog (/root/reference/src/libdwt.h:1703-1726);
integer (bit-exact) paths stay on the VPU polyphase body.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import get_wavelet

__all__ = [
    "lift_matrix",
    "fill_head_mirror",
    "fill_tail_mirror",
    "banded_blocks",
    "apply_banded",
    "pack_blocks",
    "split_bf16",
    "apply_packed",
    "build_fwd2_mats",
    "fwd2_strip_packed",
    "build_inv_mats",
    "synthesis2d_packed",
    "mxu_supported",
]

#: sublane alignment for block row/col starts and sizes.
_ALIGN = 8
#: output rows per banded block (one MXU tile of output rows).
_BLOCK = 128

#: bf16 split-product emission mode:
#:   'three' — Whi@xhi + Whi@xlo + Wlo@xhi as three separate dots
#:             (the measured-working default; no layout constraints)
#:   'two'   — the Whi terms as ONE dot over a 2-way row interleave
#:             (xhi, xlo) x column-interleaved (Whi, Whi), plus the
#:             Wlo@xhi correction dot — 2 MXU passes per block
#:   'fused' — all terms as ONE dot (4-way interleave).  Compiles in
#:             small probes but Mosaic HANGS at the full 4K
#:             streamed-kernel scale (>45 min, no error) —
#:             tools/repro_fused_dot.py is the bounded repro.
#: The interleaved modes need operand lane widths that are
#: 128-multiples (the strip kernels pad, see _pad_sublanes_128).
#: Overridable for offline probes via $LIBDWT_TPU_DOT_EMISSION.
import os as _os

DOT_EMISSION = _os.environ.get("LIBDWT_TPU_DOT_EMISSION", "three")
if DOT_EMISSION not in ("three", "two", "fused"):  # pragma: no cover
    raise ValueError(
        f"LIBDWT_TPU_DOT_EMISSION={DOT_EMISSION!r} (want three|two|fused)")

#: legacy alias (True == 'fused'); prefer DOT_EMISSION.
FUSED_DOT = False

#: lane-panel width for the INTERLEAVED dot emissions ('two'/'fused').
#: Mosaic's per-dot compile cost on a row-interleaved operand grows
#: ~quadratically with the operand's LANE width (tools/repro_fused_dot
#: bisection: 1.15 s/dot at 1024 lanes, 4.2 at 2048, >17.5 at 4096 —
#: BENCH_NOTES round 4), so a 4096-lane frame is processed as 4
#: 1024-lane column panels: 4x the dots at ~1/16 the unit cost = ~4x
#: cheaper compile, same math (disjoint output columns).
#: Must be a multiple of 128 (the interleave lowering's lane-width
#: constraint); <= 0 disables paneling.  The 'three' emission has no
#: interleaved operands and never panels.
DOT_PANEL = int(_os.environ.get("LIBDWT_TPU_DOT_PANEL", "1024"))
if DOT_PANEL > 0 and DOT_PANEL % 128:  # pragma: no cover
    raise ValueError(
        f"LIBDWT_TPU_DOT_PANEL={DOT_PANEL} must be a multiple of 128")


def _lane_panels(c: int) -> List[Tuple[int, int]]:
    """Static (start, width) panels covering ``c`` lanes."""
    if DOT_PANEL <= 0 or c <= DOT_PANEL:
        return [(0, c)]
    return [(p, min(DOT_PANEL, c - p)) for p in range(0, c, DOT_PANEL)]


def _mode() -> str:
    # honour a caller flipping the legacy flag
    return "fused" if FUSED_DOT else DOT_EMISSION


def mxu_supported(wavelet, dtype) -> bool:
    """The MXU body covers float32 symmetric-step wavelets (the same
    set as the fused kernels); integers need bit-exact sequential
    lifting, and the bf16-split matmuls are calibrated for f32 data."""
    from libdwt_tpu.ops.fused import fused_supported

    return jnp.dtype(dtype) == jnp.float32 and fused_supported(wavelet)


# ------------------------------------------------------------ construction


def _steps_weights(st) -> Tuple[float, float]:
    if st.is_symmetric:
        return float(st.coeff), float(st.coeff)
    return float(st.left or 0.0), float(st.right or 0.0)


def lift_matrix(
    n: int,
    wavelet,
    inverse: bool = False,
    edges: Tuple[bool, bool] = (False, False),
    scale: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """(n, n) matrix of the full interleaved 1-D lifting pass.

    ``edges``: whole-point mirror at the low/high signal end; where
    False, out-of-range neighbour contributions are dropped (the strip
    kernels discard those halo rows, so any convention works there).
    """
    wavelet = get_wavelet(wavelet)
    M = np.eye(n, dtype=np.float64)
    lo = hi = None
    if scale and wavelet.scale_s is not None:
        if inverse:
            lo = (wavelet.inv_scale_s if wavelet.inv_scale_s is not None
                  else wavelet.scale_d)
            hi = (wavelet.inv_scale_d if wavelet.inv_scale_d is not None
                  else wavelet.scale_s)
        else:
            lo, hi = wavelet.scale_s, wavelet.scale_d
    if inverse and lo is not None:
        d = np.where(np.arange(n) % 2 == 0, lo, hi)
        M *= d[:, None]
    steps = wavelet.steps[::-1] if inverse else wavelet.steps
    sgn = -1.0 if inverse else 1.0
    for st in steps:
        wl, wr = _steps_weights(st)
        wl, wr = sgn * wl, sgn * wr
        start = 1 if st.target == "d" else 0
        idx = np.arange(start, n, 2)
        il, ir = idx - 1, idx + 1
        # whole-point mirror: x[-1] = x[1], x[n] = x[n-2]
        if edges[0]:
            il = np.where(il < 0, 1, il)
        if edges[1]:
            ir = np.where(ir > n - 1, n - 2, ir)
        upd = np.zeros((len(idx), n))
        ok_l = (il >= 0) & (il < n)
        if wl and ok_l.any():
            upd[ok_l] += wl * M[il[ok_l]]
        ok_r = (ir >= 0) & (ir < n)
        if wr and ok_r.any():
            upd[ok_r] += wr * M[ir[ok_r]]
        M[idx] += upd
    if not inverse and lo is not None:
        d = np.where(np.arange(n) % 2 == 0, lo, hi)
        M *= d[:, None]
    return M.astype(dtype)


def fill_head_mirror(n: int, center: int, count: int,
                     repeat: bool = False) -> np.ndarray:
    """Matrix of ``ops.fused._mirror_head_ax``: rows [center-count,
    center) become copies of the rows after ``center`` (whole-point:
    row center-m := center+m; repeat: := center+m-1)."""
    E = np.eye(n, dtype=np.float64)
    for m in range(1, count + 1):
        src = center + m - 1 if repeat else center + m
        E[center - m] = 0.0
        E[center - m, src] = 1.0
    return E


def fill_tail_mirror(n: int, edge: int, count: int,
                     repeat: bool = False) -> np.ndarray:
    """Matrix of ``ops.fused._mirror_tail_ax``: rows (edge, edge+count]
    mirror the rows at/before ``edge``; rows beyond are zeroed."""
    count = max(0, min(count, n - 1 - edge))
    E = np.eye(n, dtype=np.float64)
    for m in range(1, count + 1):
        src = edge - m + 1 if repeat else edge - m
        E[edge + m] = 0.0
        E[edge + m, src] = 1.0
    E[edge + count + 1:] = 0.0
    return E


# ---------------------------------------------------------------- blocking


def banded_blocks(
    M: np.ndarray,
    block: int = _BLOCK,
    dtype=np.float32,
) -> List[Tuple[np.ndarray, int]]:
    """Decompose a banded matrix into [(W, src_start), ...] so that
    ``concat([W_j @ x[s_j : s_j + W_j.shape[1]]])`` equals ``M @ x``.

    Row blocks are ``block`` tall (last one shorter); each keeps only
    its nonzero column window, widened to sublane-aligned start/size.
    """
    n_out, n_in = M.shape
    out = []
    for r0 in range(0, n_out, block):
        r1 = min(r0 + block, n_out)
        sub = M[r0:r1]
        nz = np.nonzero(np.any(sub != 0.0, axis=0))[0]
        if len(nz) == 0:
            out.append((np.zeros((r1 - r0, _ALIGN), dtype), 0))
            continue
        c0 = (int(nz[0]) // _ALIGN) * _ALIGN
        c1 = int(nz[-1]) + 1
        width = -(-(c1 - c0) // _ALIGN) * _ALIGN
        if c0 + width > n_in:
            c0 = max(0, ((n_in - width) // _ALIGN) * _ALIGN)
            width = min(width, n_in - c0)
            if c0 + width < c1:
                # n_in too ragged for an aligned window: cover the band
                # even if the width ends up unaligned
                width = c1 - c0
        out.append((sub[:, c0:c0 + width].astype(dtype), c0))
    return out


def apply_banded(x, blocks: Sequence[Tuple[np.ndarray, int]],
                 precision: str = "high"):
    """``M @ x`` as per-block MXU matmuls over static sublane windows
    of ``x`` (shape (n_in, c)).  Blocks come from :func:`banded_blocks`;
    the concat operands are all fresh matmul results (offset-0 layouts),
    which Mosaic concatenates without relayout."""
    parts = []
    for W, s in blocks:
        win = jax.lax.slice_in_dim(x, s, s + W.shape[1], axis=0)
        parts.append(
            jax.lax.dot_general(
                jnp.asarray(W, x.dtype), win,
                (((1,), (0,)), ((), ())),
                preferred_element_type=x.dtype,
                precision=precision,
            )
        )
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


# ------------------------------------------------------------ packing
#
# Pallas kernels may not CAPTURE array constants ("You should pass them
# as inputs"), so the per-strip block matrices are deduplicated and
# stacked into one (K, block, wmax) array per lifting pass, passed to
# the kernel as a VMEM input; the kernel indexes it with STATIC
# (idx, rows, start) metadata (the strip loop is Python-unrolled).


def pack_blocks(
    instances: Sequence[Sequence[Tuple[np.ndarray, int]]],
    n_in: int,
    dtype=np.float32,
    block: int = _BLOCK,
) -> Tuple[np.ndarray, List[List[Tuple[int, int, int]]]]:
    """Stack many block-lists (all acting on length-``n_in`` signals)
    into one deduplicated (K, block, wmax) array.

    Each block ``(W, s)`` becomes a zero-padded (block, wmax) canvas and
    a meta triple ``(idx, rows, start)`` with
    ``canvas[idx][:rows] @ x[start:start+wmax] == W @ x[s:s+W.cols]``.
    Identical canvases (e.g. every interior strip's lifting band) share
    one slot, so K stays small.  Canvas placement keeps the column
    offset at 0 except when the window would run past the signal end.
    """
    wmax = max(
        (W.shape[1] for blocks in instances for W, _ in blocks), default=0
    )
    wmax = min(-(-wmax // _ALIGN) * _ALIGN, n_in)

    def _place(s: int, cols: int, width: int):
        """Aligned window start covering [s, s+cols) within n_in, or
        None if ``width`` is too narrow for this block's geometry."""
        start = s
        if start + width > n_in:
            start = ((n_in - width) // _ALIGN) * _ALIGN
            if start < 0 or s - start + cols > width:
                return None
        return start

    # ragged tails (an unaligned n_in - width gap) can need a wider
    # window than the widest block: widen until every block places
    while wmax < n_in and not all(
        _place(s, W.shape[1], wmax) is not None
        for blocks in instances for W, s in blocks
    ):
        wmax = min(wmax + _ALIGN, n_in)

    canvases: List[np.ndarray] = []
    index: dict = {}
    metas: List[List[Tuple[int, int, int]]] = []
    for blocks in instances:
        mine = []
        for W, s in blocks:
            rows, cols = W.shape
            start = _place(s, cols, wmax)
            if start is None:
                raise ValueError(
                    f"cannot place block (s={s}, cols={cols}) in a "
                    f"{wmax}-wide window over n_in={n_in}")
            off = s - start
            canvas = np.zeros((block, wmax), dtype)
            canvas[:rows, off:off + cols] = W
            key = (rows, canvas.tobytes())
            idx = index.get(key)
            if idx is None:
                idx = len(canvases)
                index[key] = idx
                canvases.append(canvas)
            mine.append((idx, rows, start))
        metas.append(mine)
    mats = (np.stack(canvases) if canvases
            else np.zeros((1, block, max(wmax, _ALIGN)), dtype))
    return mats, metas


def split_bf16(M: np.ndarray) -> np.ndarray:
    """bf16 split of a (K, B, W) f32 canvas stack, laid out for
    :func:`apply_packed`'s emission mode.

    FUSED_DOT: column-interleaved 4-way — out[..., 4c] = out[..., 4c+1]
    = bf16(M[..., c]) ("hi"), out[..., 4c+2] = out[..., 4c+3] =
    bf16(M - f32(hi))[..., c] ("lo") — matching the 4-way
    row-interleaved input so the whole split-product matmul runs as ONE
    bf16 dot per block.  4-way (not the flop-minimal 3-way) because
    Mosaic's sublane interleave only lowers power-of-two group sizes —
    a 3-way (n,3,c)->(3n,c) reshape crashes the compiler — and the
    fourth lane adds the Wlo@xlo term for free (full split product,
    strictly more accurate than XLA's 3-pass precision=HIGH).

    Fallback (FUSED_DOT=False): plain lane-concatenated [hi | lo]
    blocks for the separate 3-dot emission."""
    import ml_dtypes

    hi = M.astype(ml_dtypes.bfloat16)
    lo = (M - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    mode = _mode()
    if mode == "three":
        return np.concatenate([hi, lo], axis=-1)
    if mode == "two":
        # [2-way column-interleaved (Whi, Whi) | Wlo]: dot1 against the
        # row-interleaved (xhi, xlo) covers Whi@xhi + Whi@xlo; dot2 is
        # the Wlo@xhi correction
        out = np.empty(M.shape[:-1] + (3 * M.shape[-1],), ml_dtypes.bfloat16)
        out[..., 0 : 2 * M.shape[-1] : 2] = hi
        out[..., 1 : 2 * M.shape[-1] : 2] = hi
        out[..., 2 * M.shape[-1] :] = lo
        return out
    out = np.empty(M.shape[:-1] + (4 * M.shape[-1],), ml_dtypes.bfloat16)
    out[..., 0::4] = hi
    out[..., 1::4] = hi
    out[..., 2::4] = lo
    out[..., 3::4] = lo
    return out


def apply_packed(x, mats_ref, metas, upcast: bool = False):
    """``M @ x`` inside a Pallas kernel.  ``mats_ref`` is the
    (K, block, 3*wmax) bf16 VMEM input
    (:func:`pack_blocks` + :func:`split_bf16`), ``metas`` the static
    per-block triples.

    Mosaic rejects ``precision=HIGH`` on in-kernel dots, so the f32
    split-product decomposition is emitted by hand — and FUSED into one
    MXU pass per block: with W ~= Whi + Wlo and x ~= xhi + xlo (bf16
    splits), W@x ~= (Whi+Wlo)@(xhi+xlo) (~2^-17 relative; all four
    cross terms included).  The input rows are interleaved
    (xhi[r], xlo[r], xhi[r], xlo[r]) and the weight columns
    (Whi, Whi, Wlo, Wlo), so the whole sum is ONE native bf16 dot with
    K quadrupled — one MXU op per block instead of three+ separate
    passes, deeper pipeline.  All concat operands are fresh matmul
    results (offset-0 layouts).

    ``upcast=True`` (the interpret/CPU path) computes each dot in f32:
    bf16 products are exact in f32 and both paths accumulate in f32,
    so results agree with the TPU bf16 dot up to summation order —
    and the CPU backend lacks a bf16 x bf16 = f32 dot thunk for some
    shapes ("DotThunk::Execute: BF16 x BF16 = F32")."""
    mode = _mode()
    wmax = mats_ref.shape[-1] // {"three": 2, "two": 3, "fused": 4}[mode]
    n, c = x.shape
    xhi = x.astype(jnp.bfloat16)
    xlo = (x - xhi.astype(x.dtype)).astype(jnp.bfloat16)

    def _dot(a, b):
        if upcast:
            # interpret mode may still execute on a TPU backend, where
            # a DEFAULT-precision f32 dot is a single bf16 pass (~1e-2
            # relative) — pin exact f32
            return jax.lax.dot_general(
                a.astype(jnp.float32), b.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _paneled(block_dot):
        """Emit ``block_dot(p0, pw)`` per lane panel and stitch the
        disjoint output columns back together — no cross-panel
        accumulation, so results match the unpaneled dot up to the
        backend dot's internal reduction order, while each dot's
        operand lane width stays <= DOT_PANEL, under Mosaic's
        compile-cost wall."""
        cols = [block_dot(p0, pw) for p0, pw in _lane_panels(c)]
        return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    if mode == "fused":
        x4 = jnp.concatenate(
            [xhi.reshape(n, 1, c), xlo.reshape(n, 1, c),
             xhi.reshape(n, 1, c), xlo.reshape(n, 1, c)], axis=1
        ).reshape(4 * n, c)
        # rows (xhi[r], xlo[r], xhi[r], xlo[r]) x weight columns
        # (Whi, Whi, Wlo, Wlo): every split-product cross term, one dot.
        parts = []
        for idx, rows, start in metas:
            w4 = mats_ref[idx, :rows, :] if rows != mats_ref.shape[1] else (
                mats_ref[idx])
            win = jax.lax.slice_in_dim(x4, 4 * start, 4 * (start + wmax),
                                       axis=0)
            parts.append(_paneled(
                lambda p0, pw, win=win, w4=w4: _dot(
                    w4, jax.lax.slice_in_dim(win, p0, p0 + pw, axis=1)
                ).astype(x.dtype)))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    if mode == "two":
        # rows (xhi[r], xlo[r]) x weight columns (Whi, Whi) fold the
        # two Whi terms into one dot; Wlo@xhi is the correction dot —
        # 2 MXU passes per block and only a power-of-two (2-way)
        # interleave for Mosaic to lower.
        x2 = jnp.concatenate(
            [xhi.reshape(n, 1, c), xlo.reshape(n, 1, c)], axis=1
        ).reshape(2 * n, c)
        parts = []
        for idx, rows, start in metas:
            whh = mats_ref[idx, :rows, : 2 * wmax]
            wlo = mats_ref[idx, :rows, 2 * wmax :]
            win2 = jax.lax.slice_in_dim(x2, 2 * start, 2 * (start + wmax),
                                        axis=0)
            hi_win = jax.lax.slice_in_dim(xhi, start, start + wmax, axis=0)
            parts.append(_paneled(
                lambda p0, pw, win2=win2, hi_win=hi_win, whh=whh, wlo=wlo:
                (_dot(whh, jax.lax.slice_in_dim(win2, p0, p0 + pw, axis=1))
                 + _dot(wlo, jax.lax.slice_in_dim(hi_win, p0, p0 + pw,
                                                  axis=1))).astype(x.dtype)))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    # 3-dot fallback: the [hi | lo] canvas halves are contiguous lane
    # slices (no lane-splitting reshape, which Mosaic cannot lower)
    parts = []
    for idx, rows, start in metas:
        whi = mats_ref[idx, :rows, :wmax]
        wlo = mats_ref[idx, :rows, wmax:]
        hi_win = jax.lax.slice_in_dim(xhi, start, start + wmax, axis=0)
        lo_win = jax.lax.slice_in_dim(xlo, start, start + wmax, axis=0)
        parts.append(
            (_dot(whi, hi_win) + _dot(whi, lo_win)
             + _dot(wlo, hi_win)).astype(x.dtype)
        )
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


# ----------------------------------------------------- strip matrix caches
#
# The streamed kernels are Python-unrolled, so every strip's mirror
# geometry is static; matrices are cached per (geometry, wavelet) and
# closed over as kernel constants.


@functools.lru_cache(maxsize=None)
def _col_fwd_blocks_cached(n: int, wname: str, head: Optional[Tuple],
                           tail: Optional[Tuple]) -> tuple:
    E = np.eye(n)
    if head is not None:
        center, count = head
        E = fill_head_mirror(n, center, count) @ E
    if tail is not None:
        edge, count = tail
        E = fill_tail_mirror(n, edge, count) @ E
    L = lift_matrix(n, wname, inverse=False, edges=(False, False),
                    dtype=np.float64)
    return tuple(banded_blocks((L @ E)))


def col_fwd_blocks(n, wavelet, head=None, tail=None):
    """Column-pass forward blocks for an n-row strip buffer with the
    given mirror fills (head=(center, count), tail=(edge, count))."""
    return _col_fwd_blocks_cached(n, get_wavelet(wavelet).name,
                                  tuple(head) if head else None,
                                  tuple(tail) if tail else None)


@functools.lru_cache(maxsize=None)
def _lane_fwd_blocks_cached(n: int, wname: str) -> tuple:
    L = lift_matrix(n, wname, inverse=False, edges=(True, True),
                    dtype=np.float64)
    return tuple(banded_blocks(L))


def lane_fwd_blocks(n, wavelet):
    """Lane-pass forward blocks over the true signal width (whole-point
    mirror at both ends), applied through a transpose sandwich."""
    return _lane_fwd_blocks_cached(n, get_wavelet(wavelet).name)


@functools.lru_cache(maxsize=None)
def _col_inv_blocks_cached(n: int, wname: str, fixes: tuple) -> tuple:
    E = np.eye(n)
    for kind, a, b, repeat in fixes:
        if kind == "head":
            E = fill_head_mirror(n, a, b, repeat=repeat) @ E
        else:
            E = fill_tail_mirror(n, a, b, repeat=repeat) @ E
    L = lift_matrix(n, wname, inverse=True, edges=(False, False),
                    dtype=np.float64)
    return tuple(banded_blocks((L @ E)))


def col_inv_blocks(n, wavelet, fixes=()):
    """Column-pass inverse blocks; ``fixes`` is a tuple of
    ('head'|'tail', pos, count, repeat) channel-mirror fills applied
    before the synthesis lifting."""
    return _col_inv_blocks_cached(n, get_wavelet(wavelet).name,
                                  tuple(fixes))


@functools.lru_cache(maxsize=None)
def _lane_inv_blocks_cached(n: int, wname: str) -> tuple:
    L = lift_matrix(n, wname, inverse=True, edges=(True, True),
                    dtype=np.float64)
    return tuple(banded_blocks(L))


def lane_inv_blocks(n, wavelet):
    return _lane_inv_blocks_cached(n, get_wavelet(wavelet).name)


# ------------------------------------------------------------ kernel bodies


def build_fwd2_mats(h, w, ty, tyw, top2, halo2, wavelet, dtype=np.float32):
    """Packed matrices + per-strip metadata for the 2-level streamed
    forward body: four stacked arrays (col level-1, lane level-1, col
    level-2, lane level-2) to pass as kernel inputs, and a metas dict
    with per-strip column metas (head/tail mirror fills folded in) and
    shared lane metas."""
    wavelet = get_wavelet(wavelet)
    ny = -(-h // ty)
    col1, col2 = [], []
    for i in range(ny):
        want_lo = i * ty - top2
        head = (top2, halo2) if i == 0 else None
        tail = (((h - 1) - want_lo, halo2)
                if i * ty + ty + halo2 > h else None)
        col1.append(col_fwd_blocks(tyw, wavelet, head, tail))
        tail2 = ((h // 2 - 1 - want_lo // 2, halo2 // 2)
                 if want_lo + tyw > h else None)
        col2.append(col_fwd_blocks(tyw // 2, wavelet, None, tail2))
    m_c1, meta_c1 = pack_blocks(col1, tyw, dtype)
    m_l1, meta_l1 = pack_blocks([lane_fwd_blocks(w, wavelet)], w, dtype)
    m_c2, meta_c2 = pack_blocks(col2, tyw // 2, dtype)
    m_l2, meta_l2 = pack_blocks(
        [lane_fwd_blocks(w // 2, wavelet)], w // 2, dtype)
    mats = tuple(split_bf16(m) for m in (m_c1, m_l1, m_c2, m_l2))
    metas = {"col1": meta_c1, "lane1": meta_l1[0],
             "col2": meta_c2, "lane2": meta_l2[0]}
    return mats, metas


def _pad_sublanes_128(u):
    """Pad an array's SUBLANE count to a multiple of 128 with zeros.
    The 4-way bf16 interleave of :func:`apply_packed` only lowers when
    the operand's LANE width is a multiple of 128 (Mosaic crashes
    otherwise — observed as compile-helper exit 1 at c=144/192/320/448
    while 256/384/512/1024 compile), so transpose-sandwich callers pad
    rows BEFORE the transpose; the pad columns produce zero outputs
    that the caller slices away after transposing back.  No-op in the
    3-dot mode, which has no lane-width constraint.  Returns
    (padded, original_rows)."""
    r = u.shape[0]
    rp = -(-r // 128) * 128
    if rp == r or _mode() == "three":
        return u, r
    return jnp.concatenate(
        [u, jnp.zeros((rp - r,) + u.shape[1:], u.dtype)], axis=0), r


def analysis2d_packed(t, col_ref, col_meta, lane_ref, lane_meta,
                      upcast: bool = False):
    """One 2-D analysis level inside a Pallas kernel via two packed
    banded matmul passes (columns, then lanes through a transpose
    sandwich), then the cheap polyphase reshapes to channel quadrants.
    Equals ``ops.fused._analysis2d_poly`` (with the strip's mirror
    fills folded into the column matrices) on all rows the strip
    keeps."""
    from libdwt_tpu.ops.fused import _deint_sub

    u = apply_packed(t, col_ref, col_meta, upcast)    # (R, w): y-lifted
    u, R = _pad_sublanes_128(u)
    v = apply_packed(u.T, lane_ref, lane_meta, upcast)  # (w, Rp): x-lifted
    xe, xo = _deint_sub(v)                    # (w/2, Rp): even / odd x
    E, O = xe.T[:R], xo.T[:R]                 # (R, w/2)
    ll, lh = _deint_sub(E)                    # even / odd y of low-x
    hl, hh = _deint_sub(O)
    return ll, hl, lh, hh


def build_inv_mats(n_rows, w, wavelet, dtype=np.float32):
    """Packed matrices + metadata for ONE synthesis level on an
    ``n_rows``-row interleaved tile of width ``w``: (col, lane) stacked
    bf16-split arrays and their metas.  Border-mirror fixes stay on the
    VPU (they touch CFIX rows per band), so the matrices carry no
    per-strip variants."""
    wavelet = get_wavelet(wavelet)
    m_col, meta_col = pack_blocks(
        [tuple(banded_blocks(lift_matrix(
            n_rows, wavelet, inverse=True, edges=(False, False),
            dtype=np.float64)))],
        n_rows, dtype)
    m_lane, meta_lane = pack_blocks([lane_inv_blocks(w, wavelet)], w, dtype)
    return ((split_bf16(m_col), split_bf16(m_lane)),
            (meta_col[0], meta_lane[0]))


def synthesis2d_packed(ll, hl, lh, hh, col_ref, col_meta,
                       lane_ref, lane_meta, upcast: bool = False):
    """One 2-D synthesis level inside a Pallas kernel: interleave the
    (already border-fixed) channel quadrants, then inverse-lift lanes
    and columns as packed banded matmuls.  Equals
    ``ops.fused._synthesis2d_poly`` on all rows the strip keeps (the
    inverse scaling is folded into the matrices; buffer-edge rows
    differ and are discarded by the caller's slice)."""
    from libdwt_tpu.ops.fused import _merge_sub

    # x-interleave each y-parity half: (w, Rp) with rows = x positions
    # (bands' rows sublane-padded to 128-multiples BEFORE the
    # transpose: see _pad_sublanes_128)
    llp, R = _pad_sublanes_128(ll)
    hlp, _ = _pad_sublanes_128(hl)
    lhp, _ = _pad_sublanes_128(lh)
    hhp, _ = _pad_sublanes_128(hh)
    Et = _merge_sub(llp.T, hlp.T)
    Ot = _merge_sub(lhp.T, hhp.T)
    eY = apply_packed(Et, lane_ref, lane_meta, upcast).T[:R]  # (R, w)
    oY = apply_packed(Ot, lane_ref, lane_meta, upcast).T[:R]  # (R, w)
    T = _merge_sub(eY, oY)                         # (2R, w) interleaved
    return apply_packed(T, col_ref, col_meta, upcast)


def fwd2_strip_packed(t, i, refs, metas, upcast: bool = False):
    """Both forward analysis levels of streamed strip ``i`` via packed
    banded matmuls; all border-mirror fills (head/tail/LL fix) are
    folded into the column matrices.  ``refs`` are the four stacked
    VMEM inputs of :func:`build_fwd2_mats`.  Returns full-buffer
    quadrants (ll2, hl2, lh2, hh2, hl1, lh1, hh1); the caller slices
    kept rows exactly as for the polyphase body."""
    m_c1, m_l1, m_c2, m_l2 = refs
    ll, hl1, lh1, hh1 = analysis2d_packed(
        t, m_c1, metas["col1"][i], m_l1, metas["lane1"], upcast)
    ll2, hl2, lh2, hh2 = analysis2d_packed(
        ll, m_c2, metas["col2"][i], m_l2, metas["lane2"], upcast)
    return ll2, hl2, lh2, hh2, hl1, lh1, hh1
