"""Feature extraction and denoise threshold vs reference formulas."""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import fdwt2
from libdwt_tpu.ops import features as F
from libdwt_tpu.utils.subband import count_subbands
from libdwt_tpu.utils.testimg import test_image as make_test_image


@pytest.fixture(scope="module")
def band():
    rng = np.random.RandomState(7)
    return jnp.asarray(rng.randn(16, 24).astype(np.float64))


def test_band_aggregates_match_numpy(band):
    a = np.asarray(band)
    assert np.isclose(float(F.band_wps(band, 2)), (a * a).sum() / 4)
    assert np.isclose(float(F.band_mean(band)), a.mean())
    assert np.isclose(float(F.band_var(band)), ((a - a.mean()) ** 2).mean())
    assert np.isclose(float(F.band_stdev(band)), a.std())
    m = a.mean()
    sd = a.std()
    assert np.isclose(float(F.band_skew(band)), ((a - m) ** 3).mean() / sd**3)
    assert np.isclose(float(F.band_kurt(band)), ((a - m) ** 4).mean() / sd**4 - 3)
    assert np.isclose(float(F.band_maxnorm(band)), np.abs(a).max())
    assert np.isclose(float(F.band_norm(band)), np.sqrt((a * a).sum()))
    # lp norm: reference takes sum(|c|^p)^(1/p) (libdwt.c:23445-23468)
    assert np.isclose(
        float(F.band_lpnorm(band, 0.5)), (np.sqrt(np.abs(a)).sum()) ** 2
    )
    # median: sorted[size//2] convention (libdwt.c:23160)
    assert float(F.band_med(band)) == float(np.sort(a.ravel())[a.size // 2])
    # maxidx: raster index of max magnitude
    assert int(F.band_maxidx(band)) == int(np.abs(a).argmax())


def test_feature_vector_length():
    x = jnp.asarray(make_test_image(64, 64, dtype=np.float32))
    j = 4
    a = fdwt2(x, "cdf97", j)
    fv = F.features(a, j, "mean")
    # reference iterates j=1..j_max-1 over 3 bands (libdwt.c:23495)
    assert fv.shape[-1] == 3 * (j - 1)


def test_estimate_threshold_formula():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(64, 64).astype(np.float64))
    a = fdwt2(x, "cdf97", 1)
    lam = float(F.estimate_threshold(a))
    hh = np.abs(np.asarray(a)[32:, 32:])
    med = np.sort(hh.ravel())[hh.size // 2]
    want = med / 0.6745 * np.sqrt(2 * np.log(64 * 64))
    assert np.isclose(lam, want, rtol=1e-6)


def test_denoise_reduces_noise():
    rng = np.random.RandomState(11)
    clean = np.asarray(make_test_image(64, 64, dtype=np.float32))
    noisy = clean + 5.0 * rng.randn(64, 64).astype(np.float32)
    den = np.asarray(F.denoise2(jnp.asarray(noisy), "cdf97", 3, impl="separable"))
    assert ((den - clean) ** 2).mean() < ((noisy - clean) ** 2).mean()


def test_thresholds():
    a = jnp.asarray([-3.0, -1.0, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(F.soft_threshold(a, 1.0)), [-2.0, 0.0, 0.0, 1.0]
    )
    np.testing.assert_allclose(
        np.asarray(F.hard_threshold(a, 1.0)), [-3.0, 0.0, 0.0, 2.0]
    )
