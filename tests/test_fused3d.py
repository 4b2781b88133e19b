"""Fused 3-D volume kernel vs the separable oracle.

The reference's true 3-D single-loop cores (vert2x2x2 .. vert4x4x4,
/root/reference/src/volume-dwt.c) validated the same way their
perftest does — against the separable decomposition
(volume_compare_s, /root/reference/src/volume-dwt.c:2810-2883).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import dwt3_level
from libdwt_tpu.ops.separable import idwt3_level
from libdwt_tpu.ops.fused3d import fused_dwt3_level, fused_idwt3_level

SHAPES = [(16, 16, 16), (32, 24, 40), (8, 32, 64), (24, 16, 128)]


def _rand(z, y, x, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    if np.issubdtype(dtype, np.integer):
        return jnp.asarray(rng.randint(-512, 512, (z, y, x)).astype(dtype))
    return jnp.asarray(rng.rand(z, y, x).astype(dtype))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53", "interp53"])
def test_fused3d_matches_oracle(shape, wavelet):
    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = dwt3_level(x, wavelet)
    got = fused_dwt3_level(x, wavelet, strip_z=8, interpret=True)
    assert set(got) == set(want)
    for k in got:
        assert got[k].shape == want[k].shape
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=3e-5, rtol=0
        )


@pytest.mark.parametrize("shape", [(16, 16, 16), (8, 24, 48)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_fused3d_int_bitexact(shape, wavelet):
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(*shape) * 255).astype(np.int32))
    want = dwt3_level(x, wavelet)
    got = fused_dwt3_level(x, wavelet, strip_z=8, interpret=True)
    for k in got:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_fused3d_strip_invariance():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 16, 32).astype(np.float32))
    base = fused_dwt3_level(x, "cdf97", strip_z=32, interpret=True)
    got = fused_dwt3_level(x, "cdf97", strip_z=8, interpret=True)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(base[k]), atol=3e-5, rtol=0
        )


def test_fused3d_rejects_odd():
    x = jnp.zeros((15, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="even"):
        fused_dwt3_level(x, "cdf97", interpret=True)


def test_fused3d_ysplit_large_cross_section():
    """A cross-section too large for a whole-slab VMEM window (the
    round-1 limitation) must still run via the (z, y) tile grid."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 512, 512).astype(np.float32))
    want = dwt3_level(x, "cdf97")
    got = fused_dwt3_level(x, "cdf97", interpret=True)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=3e-5, rtol=0
        )


def test_fused3d_ystrip_invariance():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 64, 32).astype(np.float32))
    base = fused_dwt3_level(x, "cdf97", strip_z=8, strip_y=64, interpret=True)
    got = fused_dwt3_level(x, "cdf97", strip_z=4, strip_y=16, interpret=True)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(base[k]), atol=3e-5, rtol=0
        )


# --------------------------------------------------------------- inverse


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_fused3d_inverse_matches_oracle(shape, wavelet):
    rng = np.random.RandomState(sum(shape) + 1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    bands = dwt3_level(x, wavelet)
    want = idwt3_level(dict(bands), wavelet)
    got = fused_idwt3_level(bands, wavelet, strip_z=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=0
    )


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_fused3d_inverse_int_bitexact(wavelet):
    rng = np.random.RandomState(4)
    x = jnp.asarray((rng.rand(16, 24, 32) * 255).astype(np.int32))
    bands = dwt3_level(x, wavelet)
    got = fused_idwt3_level(bands, wavelet, strip_z=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


def test_fused3d_roundtrip_fused_both_ways():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, 32, 64).astype(np.float32))
    bands = fused_dwt3_level(x, "cdf97", interpret=True)
    rec = fused_idwt3_level(bands, "cdf97", interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4, rtol=0)


def test_fused3d_inverse_ysplit_large_cross_section():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(8, 512, 512).astype(np.float32))
    bands = dwt3_level(x, "cdf97")
    got = fused_idwt3_level(bands, "cdf97", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-4, rtol=0)


def test_fused3d_short_last_tiles():
    """Non-dividing tile grids: penultimate z/y tiles' windows cross the
    volume end and must mirror-fill too."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(10, 34, 32).astype(np.float32))
    want = dwt3_level(x, "cdf97")
    got = fused_dwt3_level(x, "cdf97", strip_z=4, strip_y=16, interpret=True)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=3e-5, rtol=0
        )
    rec = fused_idwt3_level(got, "cdf97", strip_z=4, strip_y=16, interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4, rtol=0)


def test_fused3d_poly_approach_vs_oracle():
    # the polyphase float engine is selectable for autotuning; it must
    # match the oracle like the default interleaved engine does
    v = _rand(16, 48, 128, seed=21)
    got = fused_dwt3_level(v, "cdf97", approach="poly", interpret=True)
    want = dwt3_level(v, "cdf97")
    d = max(float(jnp.abs(got[n] - want[n]).max()) for n in got)
    assert d < 3e-6
    rec = fused_idwt3_level(got, "cdf97", approach="poly", interpret=True)
    assert float(jnp.abs(rec - v).max()) < 3e-6


def test_fused3d_rejects_unknown_approach():
    v = _rand(16, 48, 128)
    with pytest.raises(ValueError, match="approach"):
        fused_dwt3_level(v, "cdf97", approach="interleave", interpret=True)
