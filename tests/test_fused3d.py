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
from libdwt_tpu.ops.fused3d import fused_dwt3_level

SHAPES = [(16, 16, 16), (32, 24, 40), (8, 32, 64), (24, 16, 128)]


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
