"""Array interop layer: numpy / torch tensors, multi-channel transforms.

TPU-native analogue of the reference's OpenCV C++ binding
(/root/reference/src/cvdwt.cpp, cvdwt.h): ``transform`` flags API with
forward/inverse x packed/sparse x CDF 5/3 / 9/7, power-of-two resize
(resizePOT, cvdwt.cpp:15-44), per-channel split/merge (cvdwt.cpp:303-406)
and normalized coefficient display (wtshow, cvdwt.cpp:46-64).

cv::Mat becomes "any array-like": numpy arrays, torch (CPU) tensors and
jnp arrays are accepted; outputs come back in the input's library.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from libdwt_tpu.image import conv_show
from libdwt_tpu.ops.separable import fdwt2, idwt2

__all__ = [
    "DWT_FORWARD",
    "DWT_INVERSE",
    "DWT_CDF97",
    "DWT_CDF53",
    "resize_pot",
    "transform",
    "wtshow",
]

DWT_FORWARD = 1
DWT_INVERSE = 2
DWT_CDF97 = "cdf97"
DWT_CDF53 = "cdf53"


def _to_jnp(a):
    """Accept numpy / jnp / torch-CPU arrays; return (jnp array, wrap)."""
    if hasattr(a, "detach") and hasattr(a, "numpy"):  # torch tensor
        import torch  # noqa: F401

        arr = jnp.asarray(a.detach().cpu().numpy())

        def wrap(x):
            import torch

            return torch.from_numpy(np.asarray(x))

        return arr, wrap
    if isinstance(a, np.ndarray):
        return jnp.asarray(a), np.asarray
    return jnp.asarray(a), (lambda x: x)


def _channels_last(x) -> bool:
    """Heuristic shared by transform/resize_pot: a trailing axis of
    1-4 on a 3-D array whose leading axis is image-sized is a channel
    axis (cv::Mat convention, /root/reference/src/cvdwt.cpp:303)."""
    return x.ndim == 3 and x.shape[-1] in (1, 2, 3, 4) and x.shape[0] > 4


def resize_pot(img, interp: str = "linear"):
    """Resize the spatial axes up to powers of two
    (dwt::resizePOT, /root/reference/src/cvdwt.cpp:15-44).  Channels-last
    (H, W, C) arrays keep their channel axis untouched."""
    x, wrap = _to_jnp(img)
    chan_last = _channels_last(x)
    if chan_last:
        x = jnp.moveaxis(x, -1, 0)
    h, w = x.shape[-2], x.shape[-1]
    ph = 1 << (h - 1).bit_length()
    pw = 1 << (w - 1).bit_length()
    if (ph, pw) != (h, w):
        import jax

        # bilinear resize via jax.image
        x = jax.image.resize(
            x, x.shape[:-2] + (ph, pw),
            method="linear" if interp == "linear" else "nearest",
        )
    if chan_last:
        x = jnp.moveaxis(x, 0, -1)
    return wrap(x)


def transform(img, flags: int = DWT_FORWARD, wavelet: str = DWT_CDF97,
              level: Optional[int] = None):
    """dwt::transform analogue (/root/reference/src/cvdwt.cpp:303-406):
    multi-channel arrays (..., H, W) or (H, W, C) channels-last are
    split, transformed per channel with the packed layout, and merged."""
    x, wrap = _to_jnp(img)
    chan_last = _channels_last(x)
    if chan_last:
        x = jnp.moveaxis(x, -1, 0)
    fn = fdwt2 if flags & DWT_FORWARD else idwt2
    y = fn(x, wavelet, level)
    if chan_last:
        y = jnp.moveaxis(y, 0, -1)
    return wrap(y)


def wtshow(coeffs):
    """Viewable [0,1] rendering of a packed transform
    (dwt::wtshow, /root/reference/src/cvdwt.cpp:46-64)."""
    x, wrap = _to_jnp(coeffs)
    return wrap(jnp.asarray(conv_show(x)))
