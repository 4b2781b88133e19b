"""Manually-pipelined 3-D single-pass DWT kernels.

The streamed (manual double-buffered DMA) counterpart of
:mod:`libdwt_tpu.ops.fused3d`, built for the same reason as
:mod:`libdwt_tpu.ops.streamed`: the automatic pallas-grid window
pipeline does not overlap tile DMA with the lifting compute on v5e, so
these kernels stream (z, y) tiles through two VMEM slots with explicit
async copies.  The tile loop is unrolled in Python — every tile has
static geometry, the DMAs land each tile at a fixed buffer offset (no
roll normalization) and border mirrors are emitted only for edge tiles.

Semantics match the separable oracle / the reference's 3-D cores
(cube_4x4x2, /root/reference/src/volume-dwt.c:1241-1777, inverse
dispatch :2787-2808): x, y, z analysis order, whole-point symmetric
borders, float to association tolerance, integers bit-exact.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops import UnsupportedGeometry
from libdwt_tpu.ops.fused import _check_fused_supported, _lift_interleaved
from libdwt_tpu.ops.streamed import _params, _require, _strip_geom
from libdwt_tpu.ops.fused3d import (
    _check_approach,
    _BANDS,
    CZ,
    CY,
    HZ,
    HY,
    _analysis3d_poly,
    _deint_axis0,
    _deint_axis1,
    _deint_axis2,
    _int_axis0,
    _int_axis1,
    _int_axis2,
    _inv_scale3,
    _mirror_head_ax,
    _mirror_tail_ax,
    _pick_tiles,
    _scale3,
    _synthesis3d_poly,
)

__all__ = [
    "streamed3d_supported",
    "streamed_dwt3_level",
    "streamed_idwt3_level",
]

#: buffer halo above every tile (z and y axes of the signal domain).
TZH = 4   # == HZ
TYH = 8   # == HY
#: channel-domain buffer halos of the inverse.
CZH = 2   # == CZ
CYH = 8   # == CY
#: unrolled-tile budget (compile time grows linearly past it).
MAX_TILES = 32


def streamed3d_supported(shape3, wavelet, strip_z=0, strip_y=0,
                         itemsize: int = 4) -> bool:
    """Pass the real dtype itemsize: the tile picker sizes windows by
    bytes, so the gate and the kernel disagree for 8-byte dtypes
    otherwise."""
    from libdwt_tpu.ops.fused import fused_supported

    z, y, x = shape3
    if z % 2 or y % 2 or x % 2 or not fused_supported(wavelet):
        return False
    if min(z, y, x) <= HZ:  # head mirror must read DMA'd rows only
        return False
    try:
        tz, ty = _tiles3(z, y, x, itemsize, strip_z, strip_y)
    except ValueError:
        return False
    nz, nyy = -(-z // tz), -(-y // ty)
    return 2 <= nz * nyy <= MAX_TILES


def _tiles3(z, y, x, itemsize, strip_z, strip_y):
    tz_auto, ty_auto = _pick_tiles(z, y, x, itemsize)
    tz = strip_z or tz_auto
    ty = strip_y or ty_auto
    tz += tz % 2
    # tz >= HZ (== 2*CZ): only tile 0 may clamp its DMA start — a
    # smaller stride would clamp later tiles' starts without giving
    # them the head mirror (same rule as fused3d's tile pickers)
    tz = max(HZ, min(tz, z + z % 2))
    if ty % 16:
        raise ValueError("strip_y must be a multiple of 16")
    ty = min(ty, ((y + 15) // 16) * 16)
    # the double buffer needs >= 2 tiles: shrink AUTO-picked tiles (not
    # caller-pinned ones) until the grid has at least two
    while -(-z // tz) * -(-y // ty) < 2:
        if not strip_z and tz > HZ:
            tz = max(HZ, (tz // 4) * 2)
        elif not strip_y and ty > 16:
            ty = max(16, (ty // 32) * 16)
        else:
            break
    return tz, ty


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_z", "strip_y", "interpret", "approach"))
def streamed_dwt3_level(
    x: jax.Array,
    wavelet="cdf97",
    strip_z: int = 0,
    strip_y: int = 0,
    interpret: bool = False,
    approach: str = "interleaved",
) -> Dict[str, jax.Array]:
    """Single-level 3-D forward DWT -> dict of 8 subbands (as
    :func:`libdwt_tpu.dwt3_level`); even dims."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    _check_approach(approach)
    z, y, w = x.shape
    if z % 2 or y % 2 or w % 2:
        raise UnsupportedGeometry("streamed 3-D kernel needs even dims")
    if min(z, y, w) <= HZ:
        raise UnsupportedGeometry("volume too small for the streamed "
                                  "kernel; use the oracle")
    tz, ty = _tiles3(z, y, w, x.dtype.itemsize, strip_z, strip_y)
    nz, nyy = -(-z // tz), -(-y // ty)
    if not (2 <= nz * nyy <= MAX_TILES):
        raise UnsupportedGeometry(
            "geometry outside the streamed kernel's range")
    remz = z - (nz - 1) * tz
    remy = y - (nyy - 1) * ty
    tzw = tz + 2 * TZH + (4 if 0 < remz < TZH else 0)
    tyw = ty + 2 * TYH + (8 if 0 < remy < TYH else 0)
    hz_, hy_, hx_ = tz // 2, ty // 2, w // 2
    qz_t, qy_t = z // 2, y // 2
    tiles = [(iz, iy) for iz in range(nz) for iy in range(nyy)]

    def kernel(x_hbm, *refs):
        outs = refs[:8]
        in_buf = refs[8]
        stages = refs[9:17]
        in_sem, out_sem = refs[17], refs[18]

        def in_dma(t_idx):
            iz, iy = tiles[t_idx]
            _, sz, Lz, oz = _strip_geom(iz, z, tz, TZH)
            _, sy, Ly, oy = _strip_geom(iy, y, ty, TYH)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(sz, Lz), pl.ds(sy, Ly), :],
                in_buf.at[t_idx % 2, pl.ds(oz, Lz), pl.ds(oy, Ly), :],
                in_sem.at[t_idx % 2],
            )

        def out_dma(t_idx, q):
            iz, iy = tiles[t_idx]
            kz = min(tz, z - iz * tz) // 2
            ky = min(ty, y - iy * ty) // 2
            return pltpu.make_async_copy(
                stages[q].at[t_idx % 2, pl.ds(0, kz), pl.ds(0, ky), :],
                outs[q].at[pl.ds(iz * hz_, kz), pl.ds(iy * hy_, ky), :],
                out_sem.at[t_idx % 2, q],
            )

        in_dma(0).start()
        for t_idx, (iz, iy) in enumerate(tiles):
            if t_idx + 1 < len(tiles):
                in_dma(t_idx + 1).start()
            in_dma(t_idx).wait()
            t = in_buf[t_idx % 2]
            # static mirror fills on the edge tiles only (count = HZ on
            # both axes, exactly the grid kernel's rule)
            if iz == 0:
                t = _mirror_head_ax(t, TZH, HZ, 0, repeat=False)
            if iz * tz + tz + HZ > z:
                er = (z - 1) - (iz * tz - TZH)
                _require(er + HZ <= tzw - 1,
                         f"tile z={iz}: tail mirror past buffer "
                         f"(er={er}, tzw={tzw})")
                t = _mirror_tail_ax(t, er, HZ, 0, repeat=False)
            if iy == 0:
                t = _mirror_head_ax(t, TYH, HZ, 1, repeat=False)
            if iy * ty + ty + HZ > y:
                er = (y - 1) - (iy * ty - TYH)
                _require(er + HZ <= tyw - 1,
                         f"tile y={iy}: tail mirror past buffer "
                         f"(er={er}, tyw={tyw})")
                t = _mirror_tail_ax(t, er, HZ, 1, repeat=False)
            # axis order x, y, z — volume-dwt.c's dwt3_level convention
            if jnp.issubdtype(t.dtype, jnp.integer) or approach == "interleaved":
                t = _lift_interleaved(t, wavelet, axis=2, inverse=False,
                                      edges=(True, True))
                t = _lift_interleaved(t, wavelet, axis=1, inverse=False)
                t = _lift_interleaved(t, wavelet, axis=0, inverse=False)
                t = _scale3(t, wavelet)
                v = t[TZH : TZH + tz, TYH : TYH + ty, :]
                lo_z, hi_z = _deint_axis0(v)
                bands = {}
                for zn, zv in (("L", lo_z), ("H", hi_z)):
                    lo_y, hi_y = _deint_axis1(zv)
                    for yn, yv in (("L", lo_y), ("H", hi_y)):
                        lo_x, hi_x = _deint_axis2(yv)
                        bands[zn + yn + "L"] = lo_x
                        bands[zn + yn + "H"] = hi_x
            else:
                full = _analysis3d_poly(t, wavelet)
                cz_, cy_ = TZH // 2, TYH // 2
                bands = {
                    n: b[cz_ : cz_ + hz_, cy_ : cy_ + hy_, :]
                    for n, b in full.items()
                }
            if t_idx >= 2:
                for q in range(8):
                    out_dma(t_idx - 2, q).wait()
            for q, name in enumerate(_BANDS):
                stages[q][t_idx % 2, :] = bands[name]
            for q in range(8):
                out_dma(t_idx, q).start()
        for t_idx in (len(tiles) - 2, len(tiles) - 1):
            for q in range(8):
                out_dma(t_idx, q).wait()

    sd = jax.ShapeDtypeStruct((qz_t, qy_t, hx_), x.dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(8)),
        out_shape=(sd,) * 8,
        scratch_shapes=[pltpu.VMEM((2, tzw, tyw, w), x.dtype)]
        + [pltpu.VMEM((2, hz_, hy_, hx_), x.dtype)] * 8
        + [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2, 8))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(x)
    return dict(zip(_BANDS, outs))


@functools.partial(jax.jit, static_argnames=(
    "wavelet", "strip_z", "strip_y", "interpret", "approach"))
def streamed_idwt3_level(
    bands: Dict[str, jax.Array],
    wavelet="cdf97",
    strip_z: int = 0,
    strip_y: int = 0,
    interpret: bool = False,
    approach: str = "interleaved",
) -> jax.Array:
    """Single-level 3-D inverse (inverse of :func:`streamed_dwt3_level`)."""
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    _check_approach(approach)
    lll = bands["LLL"]
    cz, cy, cx = lll.shape
    z, y, w = 2 * cz, 2 * cy, 2 * cx
    for name in _BANDS:
        if bands[name].shape != (cz, cy, cx):
            raise ValueError(
                f"streamed 3-D inverse needs equal band shapes: LLL="
                f"{(cz, cy, cx)} vs {name}={bands[name].shape}"
            )
    if min(cz, cy, cx) <= CZ:
        raise UnsupportedGeometry("volume too small for the streamed "
                                  "inverse; use the oracle")
    tz, ty = _tiles3(z, y, w, lll.dtype.itemsize, strip_z, strip_y)
    nz, nyy = -(-z // tz), -(-y // ty)
    if not (2 <= nz * nyy <= MAX_TILES):
        raise UnsupportedGeometry(
            "geometry outside the streamed kernel's range")
    qz, qy = tz // 2, ty // 2
    remqz = cz - (nz - 1) * qz
    remqy = cy - (nyy - 1) * qy
    # a short last tile makes the PENULTIMATE tile's tail mirror (CZ
    # channel rows past the band edge) overrun when rem + CZ exceeds
    # the halo; bump the buffer by the axis alignment in that case
    tzw = qz + 2 * CZH + (2 if 0 < remqz < CZ and remqz + CZ > CZH else 0)
    tyw = qy + 2 * CYH + (8 if 0 < remqy < CZ and remqy + CZ > CYH else 0)
    tiles = [(iz, iy) for iz in range(nz) for iy in range(nyy)]

    def kernel(*refs):
        bands_h = refs[:8]
        out_h = refs[8]
        bufs = refs[9:17]
        ostage, in_sem, out_sem = refs[17], refs[18], refs[19]

        def in_dma(t_idx, q):
            iz, iy = tiles[t_idx]
            _, sz, Lz, oz = _strip_geom(iz, cz, qz, CZH)
            _, sy, Ly, oy = _strip_geom(iy, cy, qy, CYH)
            return pltpu.make_async_copy(
                bands_h[q].at[pl.ds(sz, Lz), pl.ds(sy, Ly), :],
                bufs[q].at[t_idx % 2, pl.ds(oz, Lz), pl.ds(oy, Ly), :],
                in_sem.at[t_idx % 2, q],
            )

        def out_dma(t_idx):
            iz, iy = tiles[t_idx]
            kz = min(tz, z - iz * tz)
            ky = min(ty, y - iy * ty)
            return pltpu.make_async_copy(
                ostage.at[t_idx % 2, pl.ds(0, kz), pl.ds(0, ky), :],
                out_h.at[pl.ds(iz * tz, kz), pl.ds(iy * ty, ky), :],
                out_sem.at[t_idx % 2],
            )

        def fix(t, iz, iy, name):
            # channel-domain mirror rules (s whole-point head / repeat
            # tail; d repeat head / whole-point tail), count = CZ
            for axis, i, stride, top, total, tw in (
                (0, iz, qz, CZH, cz, tzw),
                (1, iy, qy, CYH, cy, tyw),
            ):
                is_low = name[axis] == "L"
                if i == 0:
                    t = _mirror_head_ax(t, top, CZ, axis, repeat=not is_low)
                if i * stride + stride + CZ > total:
                    er = (total - 1) - (i * stride - top)
                    _require(er + CZ <= tw - 1,
                             f"band {name} axis {axis} tile {i}: tail "
                             f"mirror past buffer (er={er}, tw={tw})")
                    t = _mirror_tail_ax(t, er, CZ, axis, repeat=is_low)
            return t

        for q in range(8):
            in_dma(0, q).start()
        for t_idx, (iz, iy) in enumerate(tiles):
            if t_idx + 1 < len(tiles):
                for q in range(8):
                    in_dma(t_idx + 1, q).start()
            for q in range(8):
                in_dma(t_idx, q).wait()
            fixed = {
                name: fix(bufs[q][t_idx % 2], iz, iy, name)
                for q, name in enumerate(_BANDS)
            }
            if jnp.issubdtype(out_h.dtype, jnp.integer) or approach == "interleaved":
                by_zy = {}
                for zn in "LH":
                    for yn in "LH":
                        by_zy[zn + yn] = _int_axis2(
                            fixed[zn + yn + "L"], fixed[zn + yn + "H"]
                        )
                by_z = {
                    zn: _int_axis1(by_zy[zn + "L"], by_zy[zn + "H"])
                    for zn in "LH"
                }
                t = _int_axis0(by_z["L"], by_z["H"])
                t = _inv_scale3(t, wavelet)
                t = _lift_interleaved(t, wavelet, axis=0, inverse=True)
                t = _lift_interleaved(t, wavelet, axis=1, inverse=True)
                t = _lift_interleaved(t, wavelet, axis=2, inverse=True,
                                      edges=(True, True))
            else:
                t = _synthesis3d_poly(fixed, wavelet)
            if t_idx >= 2:
                out_dma(t_idx - 2).wait()
            ostage[t_idx % 2, :] = t[
                2 * CZH : 2 * CZH + tz, 2 * CYH : 2 * CYH + ty, :
            ]
            out_dma(t_idx).start()
        for t_idx in (len(tiles) - 2, len(tiles) - 1):
            out_dma(t_idx).wait()

    out_sd = jax.ShapeDtypeStruct((z, y, w), lll.dtype)
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((2, tzw, tyw, cx), lll.dtype)] * 8
        + [pltpu.VMEM((2, tz, ty, w), lll.dtype),
           pltpu.SemaphoreType.DMA((2, 8)),
           pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=None if interpret else _params(),
    )(*[bands[n] for n in _BANDS])
