"""Edge-avoiding (WCDF) weighted lifting tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu.ops.eaw import (
    eaw_lift_fwd,
    eaw_lift_inv,
    eaw_wavedec2,
    eaw_waverec2,
    eaw_weights,
)
from libdwt_tpu.ops.lifting import lift_fwd
from libdwt_tpu.utils.testimg import test_image as make_test_image

SIZES = [4, 8, 15, 16, 17, 64, 100, 101]


def test_weights_formula():
    x = jnp.asarray([0.0, 1.0, 3.0, 3.0])
    w = np.asarray(eaw_weights(x, alpha=1.0))
    np.testing.assert_allclose(
        w[:3], [1 / (1 + 1e-5), 1 / (2 + 1e-5), 1 / (0 + 1e-5)], rtol=1e-6
    )
    assert w[3] == w[2]  # border patch w[N-1] = w[N-2]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_alpha_zero_equals_unweighted(n, wavelet):
    """alpha=0 makes all weights equal; the weighted average collapses
    exactly to the plain lifting step."""
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(n).astype(np.float64))
    lo_w, hi_w, _ = eaw_lift_fwd(x, wavelet, alpha=0.0)
    lo, hi = lift_fwd(x, wavelet)
    np.testing.assert_allclose(np.asarray(lo_w), np.asarray(lo), atol=1e-12)
    np.testing.assert_allclose(np.asarray(hi_w), np.asarray(hi), atol=1e-12)


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
@pytest.mark.parametrize("alpha", [0.8, 1.2])
def test_eaw_1d_roundtrip(n, wavelet, alpha):
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(n).astype(np.float64))
    lo, hi, w = eaw_lift_fwd(x, wavelet, alpha)
    rec = eaw_lift_inv(lo, hi, w, wavelet)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize("h,w", [(16, 16), (33, 31), (64, 48)])
@pytest.mark.parametrize("level", [1, 2, None])
def test_eaw_2d_roundtrip(h, w, level):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float64))
    coeffs, wts = eaw_wavedec2(x, "cdf97", level, alpha=0.8)
    rec = eaw_waverec2(coeffs, wts, "cdf97")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-9)


def test_eaw_batched():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 32).astype(np.float64))
    lo, hi, w = eaw_lift_fwd(x, "cdf97", 0.8)
    rec = eaw_lift_inv(lo, hi, w, "cdf97")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


# ------------------------------------------------ review-regression cases


def test_asymmetric_wavelets_rejected():
    # the weighted-lifting split only exists for symmetric steps; d4
    # previously became a silent no-op (c = 2*0.0)
    x = jnp.asarray(np.random.RandomState(0).rand(32, 32).astype(np.float32))
    for wav in ("d4", "haar"):
        with pytest.raises(ValueError, match="symmetric"):
            eaw_wavedec2(x, wav, 1)
