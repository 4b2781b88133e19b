"""1-D lifting engine tests: round-trip, shapes, odd sizes, dtypes.

Models the reference's self-test matrix (examples/test/test.c:29-61 runs
every kernel variant x dtype x layout through a fwd+inv round trip).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from libdwt_tpu import dwt1, idwt1, wavedec1, waverec1, fdwt1, idwt1_packed
from libdwt_tpu.utils.testimg import EPS, max_abs_err

SIZES = [1, 2, 3, 4, 5, 7, 8, 15, 16, 17, 64, 100, 127, 128, 129, 1000]
WAVELETS = ["cdf97", "cdf53", "interp53"]


def signal(n, dtype=np.float32):
    rng = np.random.RandomState(42 + n)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return rng.randint(-(2**15), 2**15, size=n).astype(dtype)
    return rng.randn(n).astype(dtype)


@pytest.mark.parametrize("wavelet", WAVELETS)
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_float32(wavelet, n):
    x = signal(n, np.float32)
    lo, hi = dwt1(x, wavelet)
    assert lo.shape[-1] == (n + 1) // 2
    assert hi.shape[-1] == n // 2
    rec = idwt1(lo, hi, wavelet)
    assert rec.shape == x.shape
    assert max_abs_err(rec, x) <= EPS


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_float64(wavelet, n):
    x = signal(n, np.float64)
    lo, hi = dwt1(x, wavelet)
    rec = idwt1(lo, hi, wavelet)
    assert max_abs_err(rec, x) <= 1e-10


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_int32_bitexact(wavelet, n):
    """Reversible integer path must round-trip EXACTLY
    (dwt_util_compare_i semantics, /root/reference/src/libdwt.h:1432)."""
    x = signal(n, np.int32)
    lo, hi = dwt1(x, wavelet)
    assert lo.dtype == jnp.int32
    rec = idwt1(lo, hi, wavelet)
    np.testing.assert_array_equal(np.asarray(rec), x)


@pytest.mark.parametrize("n", [16, 17, 100])
def test_batched_matches_single(n):
    xs = np.stack([signal(n) for _ in range(5)])
    lo_b, hi_b = dwt1(xs, "cdf97")
    for i in range(5):
        lo, hi = dwt1(xs[i], "cdf97")
        np.testing.assert_array_equal(np.asarray(lo_b[i]), np.asarray(lo))
        np.testing.assert_array_equal(np.asarray(hi_b[i]), np.asarray(hi))


@pytest.mark.parametrize("axis", [0, 1, -1, -2])
def test_axis_argument(axis):
    x = np.asarray(signal(12 * 9).reshape(12, 9))
    lo, hi = dwt1(x, "cdf53", axis=axis)
    rec = idwt1(lo, hi, "cdf53", axis=axis)
    assert max_abs_err(rec, x) <= EPS


@pytest.mark.parametrize("n", [1, 2, 5, 31, 64, 100])
@pytest.mark.parametrize("level", [None, 0, 1, 2, 3])
def test_multilevel_1d(n, level):
    x = signal(n)
    coeffs = wavedec1(x, "cdf97", level)
    rec = waverec1(coeffs, "cdf97")
    assert max_abs_err(rec, x) <= EPS


@pytest.mark.parametrize("n", [8, 9, 31, 64, 100])
def test_packed_1d_matches_pytree(n):
    x = signal(n)
    packed = np.asarray(fdwt1(x, "cdf97", 2))
    coeffs = wavedec1(x, "cdf97", 2)
    # packed layout: [L2 | H2 | H1]
    n1 = (n + 1) // 2
    n2 = (n1 + 1) // 2
    np.testing.assert_allclose(packed[:n2], np.asarray(coeffs[0]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(packed[n2:n1], np.asarray(coeffs[1]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(packed[n1:], np.asarray(coeffs[2]), rtol=1e-6, atol=1e-6)
    rec = idwt1_packed(jnp.asarray(packed), "cdf97", 2)
    assert max_abs_err(rec, x) <= EPS
