"""Fused single-loop Pallas kernel vs the separable oracle.

The reference validates every accelerated kernel variant against the
plain path via round trips (examples/test/test.c:29-61); here every
fused configuration (wavelet x dtype x geometry x strip size) is checked
against the separable oracle directly.  Runs in Pallas interpret mode on
CPU; the real-TPU compile path is exercised by bench.py / tools/verify.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import dwt2_level, idwt2_level
from libdwt_tpu.ops.fused import fused_dwt2_level, fused_idwt2_level
from libdwt_tpu.utils.testimg import test_image as make_test_image

SIZES = [(32, 32), (64, 48), (100, 100), (101, 97), (130, 260), (33, 517)]
WAVELETS = ["cdf97", "cdf53", "interp53"]


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("wavelet", WAVELETS)
def test_fused_forward_matches_oracle(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = dwt2_level(x, wavelet)
    got = fused_dwt2_level(x, wavelet, strip_rows=32, interpret=True)
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=0)


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("wavelet", WAVELETS)
def test_fused_inverse_matches_oracle(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    bands = dwt2_level(x, wavelet)
    got = fused_idwt2_level(*bands, wavelet, strip_rows=32, interpret=True)
    want = idwt2_level(*bands, wavelet)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=0)


@pytest.mark.parametrize("h,w", [(64, 64), (101, 97), (48, 300)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_fused_int_bitexact(h, w, wavelet):
    """Reversible integer path must match the oracle bit-for-bit and
    round-trip exactly (/root/reference/src/core-int.c semantics)."""
    x = jnp.asarray(make_test_image(h, w, dtype=np.int32))
    want = dwt2_level(x, wavelet)
    got = fused_dwt2_level(x, wavelet, strip_rows=32, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rec = fused_idwt2_level(*got, wavelet, strip_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


@pytest.mark.parametrize("strip", [16, 48, 64])
def test_fused_strip_size_invariance(strip):
    """Result must not depend on the strip decomposition."""
    x = jnp.asarray(make_test_image(96, 96, dtype=np.float32))
    base = fused_dwt2_level(x, "cdf97", strip_rows=96, interpret=True)
    got = fused_dwt2_level(x, "cdf97", strip_rows=strip, interpret=True)
    for a, b in zip(got, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=0)


def test_fused_roundtrip_f32():
    x = jnp.asarray(make_test_image(128, 128, dtype=np.float32))
    bands = fused_dwt2_level(x, "cdf97", strip_rows=32, interpret=True)
    rec = fused_idwt2_level(*bands, "cdf97", strip_rows=32, interpret=True)
    assert float(np.abs(np.asarray(rec) - np.asarray(x)).max()) < 1e-3
