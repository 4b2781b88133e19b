"""Image and volume abstractions with wavelet dispatch.

TPU-native analogue of the reference's data abstractions:
  * image_t (/root/reference/src/image.h:12-206): create/load/save,
    subband views, coefficient access, fdwt/idwt dispatch over
    ``enum wavelet_t {CDF97, CDF53, INTERP53}`` (image.h:166-189),
    symmetric extend (image.h:196), MSE comparison
    (examples/cores/image2.h:63-76);
  * volume_t (/root/reference/src/volume.h:14-91): 3-D create/fill/
    copy/compare/save.

Strides and aligned allocation disappear — arrays are jnp/np values;
the stride optimizer (/root/reference/src/libdwt.c:20640) is replaced
by the TPU's (8,128) tile padding, handled inside the kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdwt_tpu.api import wavedec2
from libdwt_tpu.ops.separable import fdwt2, fdwt3, idwt2, idwt3
from libdwt_tpu.utils import io as dio
from libdwt_tpu.utils.subband import band_view, resolve_j
from libdwt_tpu.utils.testimg import test_image as _test_pattern

__all__ = ["Image", "Volume", "conv_show"]


@dataclasses.dataclass
class Image:
    """A 2-D image (or packed transform) with wavelet dispatch.

    The image_t replacement: ``data`` is a jnp array (..., H, W);
    ``j`` tracks the decomposition depth like image_fdwt_s leaves the
    transform in place (/root/reference/src/image.h:166-189).
    """

    data: jax.Array
    j: int = 0  # current decomposition depth (0 = spatial domain)

    # ------------------------------------------------------- construction

    @classmethod
    def create(cls, size_y: int, size_x: int, dtype=jnp.float32) -> "Image":
        return cls(jnp.zeros((size_y, size_x), dtype))

    @classmethod
    def load_pgm(cls, path: str) -> "Image":
        return cls(jnp.asarray(dio.load_pgm(path)))

    @classmethod
    def load_mat(cls, path: str) -> "Image":
        return cls(jnp.asarray(dio.load_mat(path)))

    @classmethod
    def load_exr(cls, path: str) -> "Image":
        """HDR float image via the native EXR codec (the reference's
        examples/hdr/exr.h analogue).  Single-channel files load as
        (H, W); multi-channel as (C, H, W) in R, G, B, A order — the
        (..., H, W) layout every transform method assumes."""
        img, _ = dio.read_exr(path)
        if img.shape[2] == 1:
            return cls(jnp.asarray(img[:, :, 0]))
        return cls(jnp.asarray(np.moveaxis(img, -1, 0)))

    @classmethod
    def test_pattern(cls, size_y: int, size_x: int, rand: int = 0,
                     dtype=np.float32) -> "Image":
        """dwt_util_test_image_fill_s analogue
        (/root/reference/src/libdwt.c:1338)."""
        return cls(jnp.asarray(_test_pattern(size_y, size_x, rand, dtype=dtype)))

    # -------------------------------------------------------------- I/O

    def save_pgm(self, path: str, **kw) -> None:
        dio.save_pgm(path, np.asarray(self.data), **kw)

    def save_mat(self, path: str) -> None:
        dio.save_mat(path, np.asarray(self.data))

    def save_exr(self, path: str) -> None:
        dio.write_exr(path, np.asarray(self.data, np.float32))

    # ------------------------------------------------------------ access

    @property
    def size_y(self) -> int:
        return self.data.shape[-2]

    @property
    def size_x(self) -> int:
        return self.data.shape[-1]

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    def subband(self, j: int, band: str) -> jax.Array:
        """View one subband of the packed transform
        (dwt_util_subband, /root/reference/src/libdwt.c:20731)."""
        return band_view(self.data, j, band)

    # -------------------------------------------------------- transforms

    def fdwt(self, wavelet="cdf97", level: Optional[int] = None) -> "Image":
        """Forward in-place-style packed transform (image_fdwt_s)."""
        j = resolve_j(self.size_y, self.size_x, level)
        return Image(fdwt2(self.data, wavelet, j), j)

    def wavedec(self, wavelet="cdf97", level: Optional[int] = None,
                impl: Optional[str] = None):
        """Pytree MRA through the dispatching fast path (fused on TPU)."""
        return wavedec2(self.data, wavelet, level, impl=impl)

    def idwt(self, wavelet="cdf97", level: Optional[int] = None) -> "Image":
        """Inverse packed transform (image_idwt_s)."""
        j = self.j if level is None else level
        return Image(idwt2(self.data, wavelet, j), 0)

    # ------------------------------------------------------- comparisons

    def mse(self, other: "Image") -> float:
        """Mean squared error (image2 compare, examples/cores/image2.h:63)."""
        a = np.asarray(self.data, np.float64)
        b = np.asarray(other.data, np.float64)
        return float(((a - b) ** 2).mean())

    def psnr(self, other: "Image", peak: float = 1.0) -> float:
        m = self.mse(other)
        return float("inf") if m == 0 else 10.0 * np.log10(peak * peak / m)

    def compare(self, other: "Image", eps: float = 1.0e-3) -> bool:
        """dwt_util_compare_s predicate (max abs diff <= eps,
        /root/reference/src/libdwt.c:1593-1620)."""
        return bool(
            np.abs(np.asarray(self.data) - np.asarray(other.data)).max() <= eps
        )


@dataclasses.dataclass
class Volume:
    """A 3-D volume (volume_t analogue, /root/reference/src/volume.h)."""

    data: jax.Array
    j: int = 0

    @classmethod
    def create(cls, size_z: int, size_y: int, size_x: int, dtype=jnp.float32):
        return cls(jnp.zeros((size_z, size_y, size_x), dtype))

    @classmethod
    def fill_test(cls, size_z: int, size_y: int, size_x: int, dtype=np.float32):
        """volume_fill_s test pattern (/root/reference/src/volume.c:41):
        each z-slice is the 2-D test image with a per-slice triangle-
        wave rand parameter (z&11 folded at 11/2)."""
        from libdwt_tpu.utils.testimg import test_image

        slices = []
        for z in range(size_z):
            rand = z & 11
            if rand > 11 // 2:
                rand = 11 - rand
            slices.append(test_image(size_y, size_x, rand, dtype=dtype))
        return cls(jnp.asarray(np.stack(slices)))

    @property
    def shape(self):
        return self.data.shape

    def fdwt(self, wavelet="cdf97", level: Optional[int] = None) -> "Volume":
        dims = self.data.shape[-3:]
        j = resolve_j(min(dims), min(dims), level)
        return Volume(fdwt3(self.data, wavelet, j), j)

    def wavedec(self, wavelet="cdf97", level: Optional[int] = None,
                impl: Optional[str] = None):
        """Pytree 3-D MRA through the dispatching fast path (fused
        volume kernel on TPU when geometry allows)."""
        from libdwt_tpu.api import wavedec3

        return wavedec3(self.data, wavelet, level, impl=impl)

    def idwt(self, wavelet="cdf97", level: Optional[int] = None) -> "Volume":
        j = self.j if level is None else level
        return Volume(idwt3(self.data, wavelet, j), 0)

    def compare(self, other: "Volume", eps: float = 1.0e-3) -> bool:
        """volume_compare_s (/root/reference/src/volume.c:99)."""
        return bool(
            np.abs(np.asarray(self.data) - np.asarray(other.data)).max() <= eps
        )


def conv_show(a, j: int = 0) -> np.ndarray:
    """Convert a transform to a viewable [0,1] image: absolute values
    log-compressed per subband style of dwt_util_conv_show_s
    (/root/reference/src/libdwt.c:21075) — here a simple global
    normalize of |coeff| with gamma, adequate for wtshow-type display
    (/root/reference/src/cvdwt.cpp:46)."""
    a = np.abs(np.asarray(a, np.float64))
    mx = a.max() or 1.0
    return (a / mx) ** 0.4
