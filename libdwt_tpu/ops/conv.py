"""Generic strided convolution and signal utilities.

TPU-native analogue of the reference's convolution/signal layer:
  * dwt_util_convolve1_s (/root/reference/src/util.c:5-48): centered
    convolution with output downsampling and kernel upsampling factors;
  * signal_t saturated border access (/root/reference/src/signal.c:79-92):
    out-of-range signal indices clamp to the edges;
  * dwt_util_find_max_pos_s (/root/reference/src/util.c:50-92).

The C loops become one batched gather; everything is jit-able and
vectorized over leading axes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["convolve1", "find_max_pos"]


def convolve1(
    x: jax.Array,
    g: jax.Array,
    *,
    y_size: Optional[int] = None,
    y_center: Optional[int] = None,
    x_center: Optional[int] = None,
    g_center: Optional[int] = None,
    downsample: int = 1,
    upsample: int = 1,
    axis: int = -1,
) -> jax.Array:
    """Centered convolution with saturated borders.

    ``y[i] = sum_j g[j] * x[downsample*i - upsample*j]`` where y, x, g
    indices are taken relative to their centers and x accesses saturate
    at the signal edges — exactly dwt_util_convolve1_s
    (/root/reference/src/util.c:29-47).  Centers default to size/2 (the
    reference's SWT convention, /root/reference/src/swt.c).
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    g = jnp.asarray(g, x.dtype)
    n = x.shape[-1]
    m = g.shape[-1]
    y_size = n if y_size is None else y_size
    y_center = y_size // 2 if y_center is None else y_center
    x_center = n // 2 if x_center is None else x_center
    g_center = m // 2 if g_center is None else g_center

    yi = jnp.arange(y_size) - y_center  # relative output index
    gj = jnp.arange(m) - g_center  # relative kernel index
    # absolute x index, clamped (saturated border)
    xi = downsample * yi[:, None] - upsample * gj[None, :] + x_center
    xi = jnp.clip(xi, 0, n - 1)
    taps = x[..., xi]  # (..., y_size, m)
    y = jnp.einsum("...ym,m->...y", taps, g)
    return jnp.moveaxis(y, -1, axis)


def find_max_pos(a: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(max, y, x) of the first maximum in raster order
    (dwt_util_find_max_pos_s, /root/reference/src/util.c:50-92)."""
    a = jnp.asarray(a)
    flat = a.reshape(a.shape[:-2] + (-1,))
    idx = jnp.argmax(flat, axis=-1)
    w = a.shape[-1]
    return jnp.max(flat, axis=-1), idx // w, idx % w
