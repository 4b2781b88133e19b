"""Interleaved (dwt-simple) layout transforms and layout conversions."""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import fdwt1, fdwt2
from libdwt_tpu.ops.interleaved import (
    fdwt1_interleaved,
    fdwt2_interleaved,
    idwt1_interleaved,
    idwt2_interleaved,
    interleaved_to_packed2,
    packed_to_interleaved2,
)
from libdwt_tpu.utils.testimg import test_image as make_test_image


@pytest.mark.parametrize("n", [8, 15, 16, 33, 64, 100])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_1d_interleaved_roundtrip(n, wavelet, level):
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(n).astype(np.float64))
    y = fdwt1_interleaved(x, wavelet, level)
    rec = idwt1_interleaved(y, wavelet, level)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize("h,w", [(16, 16), (33, 31), (64, 48)])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_2d_interleaved_roundtrip(h, w, level):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float64))
    y = fdwt2_interleaved(x, "cdf97", level)
    rec = idwt2_interleaved(y, "cdf97", level)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-9)


@pytest.mark.parametrize("h,w", [(16, 16), (32, 24), (33, 31)])
@pytest.mark.parametrize("level", [1, 2, 3])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_layout_conversion_matches_packed(h, w, level, wavelet):
    """interleaved transform + conversion == packed transform exactly
    (identical lifting arithmetic, only the final layout differs)."""
    x = jnp.asarray(make_test_image(h, w, dtype=np.float64))
    inter = fdwt2_interleaved(x, wavelet, level)
    packed = interleaved_to_packed2(inter, level)
    want = fdwt2(x, wavelet, level)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(want), atol=1e-10)
    back = packed_to_interleaved2(packed, level)
    np.testing.assert_allclose(np.asarray(back), np.asarray(inter), atol=1e-12)


def test_int_interleaved_bitexact():
    x = jnp.asarray(make_test_image(32, 32, dtype=np.int32))
    y = fdwt2_interleaved(x, "cdf53", 2)
    packed = interleaved_to_packed2(y, 2)
    want = fdwt2(x, "cdf53", 2)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(want))
    rec = idwt2_interleaved(y, "cdf53", 2)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))
