"""Seeded randomized fuzzing over shapes, levels, dtypes and layouts.

Broadens the deterministic matrix with arbitrary geometries (prime,
odd, skewed) — the class of inputs where the reference's ceil/floor
halving and border logic historically hides bugs (SURVEY §7 "hard
parts").  Seeds are fixed so failures reproduce.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import libdwt_tpu as dwt

RNG = np.random.RandomState(20260817)
SHAPES_2D = [
    (RNG.randint(5, 200), RNG.randint(5, 200)) for _ in range(12)
]
SHAPES_1D = [int(RNG.randint(2, 500)) for _ in range(12)]


@pytest.mark.parametrize("n", SHAPES_1D)
def test_fuzz_1d_roundtrip(n):
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(n).astype(np.float64))
    for wavelet in ("cdf97", "cdf53", "interp53", "haar", "d4"):
        lo, hi = dwt.dwt1(x, wavelet)
        assert lo.shape[-1] == (n + 1) // 2 and hi.shape[-1] == n // 2
        rec = dwt.idwt1(lo, hi, wavelet)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-9)


@pytest.mark.parametrize("h,w", SHAPES_2D)
def test_fuzz_2d_packed_roundtrip(h, w):
    rng = np.random.RandomState(h * 211 + w)
    x = jnp.asarray(rng.randn(h, w).astype(np.float64))
    level = int(rng.randint(1, 6))
    y = dwt.fdwt2(x, "cdf97", level)
    rec = dwt.idwt2(y, "cdf97", level)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-8)


@pytest.mark.parametrize("h,w", SHAPES_2D[:8])
def test_fuzz_2d_int_exact(h, w):
    rng = np.random.RandomState(h + w * 977)
    x = jnp.asarray(rng.randint(-30000, 30000, (h, w)).astype(np.int32))
    level = int(rng.randint(1, 5))
    for wavelet in ("cdf97", "cdf53"):
        y = dwt.fdwt2(x, wavelet, level)
        rec = dwt.idwt2(y, wavelet, level)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


@pytest.mark.parametrize("h,w", SHAPES_2D[:6])
def test_fuzz_pytree_equals_packed(h, w):
    """The two output layouts carry identical coefficients."""
    rng = np.random.RandomState(h ^ w)
    x = jnp.asarray(rng.randn(h, w).astype(np.float64))
    level = int(rng.randint(1, 4))
    packed = np.asarray(dwt.fdwt2(x, "cdf53", level))
    coeffs = dwt.wavedec2(x, "cdf53", level)
    # LL of the deepest level sits at the packed top-left
    ll = np.asarray(coeffs[0])
    np.testing.assert_allclose(packed[: ll.shape[0], : ll.shape[1]], ll, atol=1e-12)
    rec_a = np.asarray(dwt.idwt2(jnp.asarray(packed), "cdf53", level))
    rec_b = np.asarray(dwt.waverec2(coeffs, "cdf53"))
    np.testing.assert_allclose(rec_a, rec_b, atol=1e-12)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_3d_roundtrip(seed):
    rng = np.random.RandomState(seed)
    z, y, x = (int(rng.randint(4, 24)) for _ in range(3))
    v = jnp.asarray(rng.randn(z, y, x).astype(np.float64))
    level = int(rng.randint(1, 3))
    c = dwt.wavedec3(v, "cdf53", level)
    rec = dwt.waverec3(c, "cdf53")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(v), atol=1e-9)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fused_vs_oracle(seed):
    rng = np.random.RandomState(100 + seed)
    h = int(rng.randint(33, 180))
    w = int(rng.randint(33, 180))
    x = jnp.asarray(rng.randn(h, w).astype(np.float32))
    from libdwt_tpu.ops.fused import fused_dwt2_level

    want = dwt.dwt2_level(x, "cdf97")
    got = fused_dwt2_level(x, "cdf97", strip_rows=32, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=0)
