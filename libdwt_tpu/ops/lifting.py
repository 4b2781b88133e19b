"""Vectorized 1-D lifting engine (the TPU-native ``accel_lift_op4s`` analogue).

The reference implements lifting as sequential C loops over one line
(/root/reference/src/libdwt.c:2024-2133 and the ~8.5 kLoC ``accel_lift_op4s_*``
kernel zoo).  On TPU each lifting step is instead ONE data-parallel
elementwise pass over the whole (batched) polyphase channel: every odd
sample's predict and every even sample's update is independent within a
step.  The 17-variant CPU kernel zoo collapses into these few functions;
XLA fuses the passes, and the Pallas kernels in ``ops.fused`` re-use the
same step algebra on VMEM tiles.

Border semantics reproduced exactly: whole-point symmetric extension
(mirror without edge repetition), expressed as neighbour clamping of the
opposite polyphase channel:

  d[i] uses s[i], s[i+1]            with s[nl] := s[nl-1]  (even N right edge)
  s[i] uses d[i-1], d[i]            with d[-1] := d[0], d[nh] := d[nh-1]

which matches the reference's explicit boundary statements, e.g.
``tmp[0] += 2*u*tmp[1]`` and ``tmp[N-1] -= 2*p*tmp[N-2]``
(/root/reference/src/libdwt.c:2046-2058).

The low channel gets ceil(N/2) samples, the high channel floor(N/2)
(/root/reference/src/libdwt.c:2082-2083).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import Wavelet, get_wavelet


# ------------------------------------------------------------------ polyphase


def split(x: jax.Array, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Split into even (s/low-to-be) and odd (d/high-to-be) polyphase channels."""
    x = jnp.moveaxis(x, axis, -1)
    s = x[..., 0::2]
    d = x[..., 1::2]
    return jnp.moveaxis(s, -1, axis), jnp.moveaxis(d, -1, axis)


def merge(s: jax.Array, d: jax.Array, axis: int = -1) -> jax.Array:
    """Interleave polyphase channels back into one signal."""
    s = jnp.moveaxis(s, axis, -1)
    d = jnp.moveaxis(d, axis, -1)
    nl = s.shape[-1]
    nh = d.shape[-1]
    n = nl + nh
    if nl == nh:
        out = jnp.stack([s, d], axis=-1).reshape(*s.shape[:-1], n)
    else:
        # odd length: one trailing even sample
        pad = jnp.zeros_like(d[..., :1])
        out = jnp.stack([s, jnp.concatenate([d, pad], axis=-1)], axis=-1)
        out = out.reshape(*s.shape[:-1], 2 * nl)[..., :n]
    return jnp.moveaxis(out, -1, axis)


# ----------------------------------------------------- mirrored neighbourhoods
#
# ``border`` selects what a missing (virtual, out-of-signal) neighbour
# contributes, reproducing the reference's three inverse border modes:
#   'mirror' — whole-point symmetric duplication (the default;
#              accel_lift_op4s_prolog_stride_s,
#              /root/reference/src/libdwt.c:9591-9669: arr[0] += 2*b*arr[1])
#   'hole'   — the virtual neighbour contributes 0 at every step
#              (accel_lift_op4s_prolog_stride_hole_s,
#              /root/reference/src/libdwt.c:9672-9751: arr[0] += b*(arr[1]+0))
# The third mode, 'zero' (virtual zero samples that themselves lift,
# /root/reference/src/libdwt.c:9753-9830), is realized in lift_inv by
# zero-extending the channels and running with 'hole' at the far ends.


def _d_neighbors(
    s: jax.Array, nh: int, border: str = "mirror"
) -> Tuple[jax.Array, jax.Array]:
    """(left, right) even-channel neighbours of each odd sample."""
    nl = s.shape[-1]
    left = s[..., :nh]
    if nl > nh:  # odd N: every odd sample has a true right neighbour
        right = s[..., 1 : nh + 1]
    else:  # even N: the last odd sample's right neighbour is virtual
        edge = jnp.zeros_like(s[..., -1:]) if border == "hole" else s[..., -1:]
        right = jnp.concatenate([s[..., 1:], edge], axis=-1)
    return left, right


def _s_neighbors(
    d: jax.Array, nl: int, border: str = "mirror"
) -> Tuple[jax.Array, jax.Array]:
    """(left, right) odd-channel neighbours of each even sample."""
    nh = d.shape[-1]
    first = jnp.zeros_like(d[..., :1]) if border == "hole" else d[..., :1]
    left = jnp.concatenate([first, d[..., : nl - 1]], axis=-1)
    if nl == nh:
        right = d
    else:  # odd N: the last even sample's right neighbour is virtual
        edge = jnp.zeros_like(d[..., -1:]) if border == "hole" else d[..., -1:]
        right = jnp.concatenate([d, edge], axis=-1)
    return left, right


# ------------------------------------------------------------------ float path


def _float_steps(s, d, wavelet: Wavelet, inverse: bool, border: str = "mirror"):
    nl, nh = s.shape[-1], d.shape[-1]
    steps = wavelet.steps[::-1] if inverse else wavelet.steps
    sign = -1.0 if inverse else 1.0
    for step in steps:
        l, r = (
            _d_neighbors(s, nh, border)
            if step.target == "d"
            else _s_neighbors(d, nl, border)
        )
        if step.is_symmetric:
            # fused c*(l+r) matches the reference's float rounding
            upd = jnp.asarray(sign * step.coeff, s.dtype) * (l + r)
        else:
            upd = (
                jnp.asarray(sign * step.left, s.dtype) * l
                + jnp.asarray(sign * step.right, s.dtype) * r
            )
        if step.target == "d":
            d = d + upd
        else:
            s = s + upd
    return s, d


def _int_steps(s, d, wavelet: Wavelet, inverse: bool, border: str = "mirror"):
    if wavelet.int_steps is None:
        raise ValueError(f"wavelet {wavelet.name} has no reversible integer path")
    nl, nh = s.shape[-1], d.shape[-1]
    steps = wavelet.int_steps[::-1] if inverse else wavelet.int_steps
    for step in steps:
        sign = -step.sign if inverse else step.sign
        if step.target == "d":
            l, r = _d_neighbors(s, nh, border)
        else:
            l, r = _s_neighbors(d, nl, border)
        # C-exact: (wl*l + wr*r + k) >> shift with arithmetic shift
        # (/root/reference/src/libdwt.c:10918-10943, 10964-10981; one-sided
        # Haar weights /root/reference/examples/cores/cores-haar.c:10-31).
        wl, wr = step.weights
        v = jax.lax.shift_right_arithmetic(
            wl * l + wr * r + step.k, jnp.asarray(step.shift, dtype=s.dtype)
        )
        if step.target == "d":
            d = d + sign * v
        else:
            s = s + sign * v
    return s, d


# ------------------------------------------------------------------ public API


def _inv_scales(wavelet: Wavelet):
    """(inv_scale_s, inv_scale_d) with the CDF-convention fallback
    (scale_d == 1/scale_s there); D4 defines explicit values."""
    inv_s = wavelet.inv_scale_s if wavelet.inv_scale_s is not None else wavelet.scale_d
    inv_d = wavelet.inv_scale_d if wavelet.inv_scale_d is not None else wavelet.scale_s
    return inv_s, inv_d


def _check_int_dtype(dtype) -> None:
    if not jnp.issubdtype(dtype, jnp.signedinteger):
        raise ValueError(
            f"reversible integer lifting needs a signed dtype, got "
            f"{jnp.dtype(dtype).name}; cast to int32 first (negative "
            "weights and arithmetic shifts are invalid for unsigned)"
        )


def lift_fwd(
    x: jax.Array, wavelet="cdf97", axis: int = -1
) -> Tuple[jax.Array, jax.Array]:
    """Forward 1-D lifting DWT along ``axis`` (batched over all other axes).

    Returns (low, high) with sizes (ceil(N/2), floor(N/2)).
    Float dtypes follow /root/reference/src/libdwt.c:2024 (dwt_cdf97_f_ex_stride_d);
    integer dtypes follow the reversible path at :10901 (dwt_cdf97_f_ex_stride_i).
    """
    wavelet = get_wavelet(wavelet)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    if is_int:
        _check_int_dtype(x.dtype)

    if n == 0:
        s, d = x, x
    elif n == 1:
        # reference: float scales the single sample by s1; int leaves it as-is
        # (libdwt.c:2038-2041 vs :10912-10913).
        if is_int:
            s = x
        else:
            scale = wavelet.scale_s if wavelet.scale_s is not None else 1.0
            s = x * jnp.asarray(scale, x.dtype)
        d = x[..., :0]
    else:
        s, d = split(x, axis=-1)
        if is_int:
            s, d = _int_steps(s, d, wavelet, inverse=False)
        else:
            s, d = _float_steps(s, d, wavelet, inverse=False)
            if wavelet.scale_s is not None:
                s = s * jnp.asarray(wavelet.scale_s, x.dtype)
                d = d * jnp.asarray(wavelet.scale_d, x.dtype)

    return jnp.moveaxis(s, -1, axis), jnp.moveaxis(d, -1, axis)


def lift_inv(
    low: jax.Array,
    high: jax.Array,
    wavelet="cdf97",
    axis: int = -1,
    border: str = "mirror",
) -> jax.Array:
    """Inverse of :func:`lift_fwd` (semantics of dwt_cdf97_i_ex_stride_d,
    /root/reference/src/libdwt.c:11424-11483).

    ``border`` selects the virtual-sample semantics at the signal ends,
    matching the reference's three inverse families used for sparse
    reconstruction (/root/reference/src/libdwt.h:909-922):

      'mirror' — whole-point symmetric extension (dwt_*_2i_inplace_s)
      'hole'   — virtual neighbours contribute 0 at every lifting step
                 (dwt_cdf97_2i_inplace_hole_s)
      'zero'   — the signal is zero-extended and the virtual samples
                 themselves lift (dwt_cdf97_2i_inplace_zero_s); realized
                 by extending each channel with len(steps) zeros, which
                 strictly contains the reference's carried virtual pair
                 (/root/reference/src/libdwt.c:9770-9830).
    """
    if border not in ("mirror", "hole", "zero"):
        raise ValueError("border must be 'mirror', 'hole' or 'zero'")
    wavelet = get_wavelet(wavelet)
    s = jnp.moveaxis(low, axis, -1)
    d = jnp.moveaxis(high, axis, -1)
    n = s.shape[-1] + d.shape[-1]
    is_int = jnp.issubdtype(s.dtype, jnp.integer)
    if is_int:
        _check_int_dtype(s.dtype)
        if wavelet.int_steps is None:
            raise ValueError(
                f"wavelet {wavelet.name} has no reversible integer path"
            )

    if n == 0:
        return jnp.moveaxis(s, -1, axis)
    if n == 1 and border != "zero":
        # mirror/hole: every neighbour of the single sample is virtual
        # and contributes nothing at n == 1, so the inverse is the
        # plain unscaling.  'zero' differs (the virtual zero samples
        # themselves lift and feed back) and takes the padded path.
        if is_int:
            x = s
        else:
            inv_s, _ = _inv_scales(wavelet)
            x = s * jnp.asarray(inv_s if inv_s is not None else 1.0, s.dtype)
        return jnp.moveaxis(x, -1, axis)

    ext = 0
    if border == "zero":
        # Zero-extension: pad both channels, lift with zero-contributing
        # far ends, crop the virtual signal samples afterwards.  The
        # error of truncating the virtual tail at depth ``ext`` cannot
        # reach real samples: each step moves edge effects inward by one
        # channel position and there are only len(steps) steps.
        ext = len(wavelet.int_steps if is_int else wavelet.steps)
        zpad = [(0, 0)] * (s.ndim - 1) + [(ext, ext)]
        s = jnp.pad(s, zpad)
        d = jnp.pad(d, zpad)
        border = "hole"

    if is_int:
        s, d = _int_steps(s, d, wavelet, inverse=True, border=border)
    else:
        if wavelet.scale_s is not None:
            inv_s, inv_d = _inv_scales(wavelet)
            s = s * jnp.asarray(inv_s, s.dtype)
            d = d * jnp.asarray(inv_d, d.dtype)
        s, d = _float_steps(s, d, wavelet, inverse=True, border=border)

    x = merge(s, d, axis=-1)
    if ext:
        x = x[..., 2 * ext : 2 * ext + n]
    return jnp.moveaxis(x, -1, axis)
