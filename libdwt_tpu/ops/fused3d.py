"""Fused single-pass 3-D DWT Pallas kernel.

TPU-native analogue of the reference's true 3-D single-loop cores
(cube_4x4x2 etc., /root/reference/src/volume-dwt.c:1241-1777, dispatch
cdf97_3f_op_wrapper_s :2787): all three axis passes (x, y, z) in one
VMEM residency instead of the separable path's six HBM passes per
level.  Z is cut into strips with a 4-slab mirror halo (pl.Element
windows, auto-pipelined); Y and X are carried whole per slab with
host-side mirror padding.

Layout ops follow the same Mosaic constraints as the 2-D kernels:
lifting via rolls + parity masks on any axis; polyphase deinterleave on
the leading (z) axis and sublane (y) axis via reshape, and on the lane
(x) axis via a transpose sandwich per slab.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops.fused import (
    HALO,
    _check_fused_supported,
    _lift_interleaved,
    _parity_mask,
)

__all__ = ["fused_dwt3_level"]

#: soft VMEM ceiling for the (tz+8) x (Y+8) x (X+8) window + outputs
#: (physical scoped-vmem limit is 16MB; lifting holds ~3 live copies).
_VMEM_BUDGET_3D = 4 * 1024 * 1024

_BANDS = ("LLL", "LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH")


def _scale3(t, wavelet):
    if wavelet.scale_s is None or jnp.issubdtype(t.dtype, jnp.integer):
        return t
    lo = jnp.asarray(wavelet.scale_s, t.dtype)
    hi = jnp.asarray(wavelet.scale_d, t.dtype)
    for ax in (0, 1, 2):
        f = jnp.where(_parity_mask(t.shape, ax, False), lo, hi)
        t = t * f
    return t


def _deint_axis0(v):
    n = v.shape[0] // 2
    w = v.reshape(n, 2, v.shape[1], v.shape[2])
    return w[:, 0], w[:, 1]


def _deint_axis1(v):
    n = v.shape[1] // 2
    w = v.reshape(v.shape[0], n, 2, v.shape[2])
    return w[:, :, 0, :], w[:, :, 1, :]


def _deint_axis2(v):
    # lane polyphase via transpose sandwich (swap last two dims)
    vt = jnp.swapaxes(v, 1, 2)
    a, b = _deint_axis1(vt)
    return jnp.swapaxes(a, 1, 2), jnp.swapaxes(b, 1, 2)


def _3d_kernel(x_ref, *out_refs, wavelet, tz, ny, nx):
    t = x_ref[:]
    # axis order x, y, z — the separable decomposition order of
    # /root/reference/src/volume-dwt.c (dwt3_level convention).
    t = _lift_interleaved(t, wavelet, axis=2, inverse=False)
    t = _lift_interleaved(t, wavelet, axis=1, inverse=False)
    t = _lift_interleaved(t, wavelet, axis=0, inverse=False)
    t = _scale3(t, wavelet)
    v = t[HALO : HALO + tz, HALO : HALO + ny, HALO : HALO + nx]
    lo_z, hi_z = _deint_axis0(v)
    outs = {}
    for zn, zv in (("L", lo_z), ("H", hi_z)):
        lo_y, hi_y = _deint_axis1(zv)
        for yn, yv in (("L", lo_y), ("H", hi_y)):
            lo_x, hi_x = _deint_axis2(yv)
            outs[zn + yn + "L"] = lo_x
            outs[zn + yn + "H"] = hi_x
    for ref, name in zip(out_refs, _BANDS):
        ref[:] = outs[name]


@functools.partial(jax.jit, static_argnames=("wavelet", "strip_z", "interpret"))
def fused_dwt3_level(
    x: jax.Array,
    wavelet="cdf97",
    strip_z: int = 0,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """Single-level fused 3-D forward DWT -> dict of 8 subbands keyed
    'LLL'..'HHH' in (z, y, x) order — same convention and values as
    :func:`libdwt_tpu.dwt3_level` (the separable oracle); float to
    FP-association tolerance, integers bit-exact.

    Requires even (z, y, x) and a slab small enough for VMEM; callers
    should fall back to the oracle otherwise.
    """
    wavelet = get_wavelet(wavelet)
    _check_fused_supported(wavelet)
    if x.ndim != 3:
        raise ValueError("fused_dwt3_level takes one 3-D volume")
    z, y, w = x.shape
    if z % 2 or y % 2 or w % 2:
        raise ValueError("fused_dwt3_level needs even dimensions")
    if min(z, y, w) <= HALO:
        raise ValueError("volume too small for the fused kernel; use the oracle")

    slab_bytes = (y + 2 * HALO) * (w + 2 * HALO) * x.dtype.itemsize
    # the kernel keeps ~3 live copies of the window plus the output
    # blocks; demand a strip deep enough to amortize the 8-slab halo,
    # otherwise the read amplification negates the fusion win.
    max_tz = _VMEM_BUDGET_3D // (3 * slab_bytes)
    if strip_z == 0 and max_tz < 16 and max_tz < z:
        raise ValueError(
            f"slab {y}x{w} too large for an efficient VMEM strip "
            f"(max_tz={max_tz}); use the separable path"
        )
    tz = strip_z or min(z, (max_tz // 2) * 2)
    tz = min(tz, z)
    if tz % 2:
        tz -= 1
    nz = pl.cdiv(z, tz)

    xp = jnp.pad(x, ((HALO, HALO),) * 3, mode="reflect")
    xp = jnp.pad(xp, ((0, nz * tz + 2 * HALO - xp.shape[0]), (0, 0), (0, 0)))

    hz, hy, hx = tz // 2, y // 2, w // 2
    sd = jax.ShapeDtypeStruct((nz * hz, hy, hx), x.dtype)
    out_spec = pl.BlockSpec((hz, hy, hx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_3d_kernel, wavelet=wavelet, tz=tz, ny=y, nx=w)
    outs = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(tz + 2 * HALO, (0, 0)),
                    pl.Element(y + 2 * HALO, (0, 0)),
                    pl.Element(w + 2 * HALO, (0, 0)),
                ),
                lambda i: (pl.multiple_of(i * tz, 2), 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(out_spec,) * 8,
        out_shape=(sd,) * 8,
        interpret=interpret,
    )(xp)
    qz = z // 2
    return {name: band[:qz] for name, band in zip(_BANDS, outs)}
