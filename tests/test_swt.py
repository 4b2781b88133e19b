"""SWT: derived filter banks vs reference constants; transform behavior."""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu.ops.conv import convolve1, find_max_pos
from libdwt_tpu.ops.swt import analysis_filters, iswt1, iswt2, swt1, swt2, swt_level

# The reference's hardcoded filter banks (/root/reference/src/swt.c:6-16).
REF_CDF97_G = [+0.03782846, -0.02384947, -0.11062438, +0.37740287, +0.85269880,
               +0.37740287, -0.11062438, -0.02384947, +0.03782846]
REF_CDF97_H = [+0.06453887, -0.04068942, -0.41809219, +0.78848559, -0.41809219,
               -0.04068942, +0.06453887]
REF_CDF53_G = [-0.17677669, +0.35355338, +1.06066012, +0.35355338, -0.17677669]
REF_CDF53_H = [-0.35355338, +0.70710677, -0.35355338]


@pytest.mark.parametrize(
    "wavelet,ref_g,ref_h",
    [("cdf97", REF_CDF97_G, REF_CDF97_H), ("cdf53", REF_CDF53_G, REF_CDF53_H)],
)
def test_derived_filters_match_reference(wavelet, ref_g, ref_h):
    g, h, gc, hc = analysis_filters(wavelet)
    np.testing.assert_allclose(g, ref_g, atol=1e-7)
    np.testing.assert_allclose(h, ref_h, atol=1e-7)
    assert gc == len(ref_g) // 2
    assert hc == len(ref_h) // 2


def test_convolve1_matches_bruteforce():
    """convolve1 == the reference's triple-loop with saturation
    (/root/reference/src/util.c:29-47)."""
    rng = np.random.RandomState(0)
    x = rng.randn(23).astype(np.float64)
    g = rng.randn(5).astype(np.float64)
    for down, up in [(1, 1), (1, 2), (1, 4), (2, 1)]:
        n, m = len(x), len(g)
        y_size, y_center = n, n // 2
        x_center, g_center = n // 2, m // 2
        want = np.zeros(y_size)
        for yi in range(-y_center, y_size - y_center):
            acc = 0.0
            for gi in range(-g_center, m - g_center):
                xi = np.clip(down * yi - up * gi + x_center, 0, n - 1)
                acc += x[xi] * g[gi + g_center]
            want[yi + y_center] = acc
        got = convolve1(jnp.asarray(x), jnp.asarray(g), downsample=down, upsample=up)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_swt_level_shapes_and_shift_invariance():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(128).astype(np.float32))
    lo, hi = swt_level(x, "cdf97", level=0)
    assert lo.shape == x.shape and hi.shape == x.shape
    # undecimated transform commutes with interior shifts
    xs = jnp.roll(x, 8)
    los, _ = swt_level(xs, "cdf97", level=0)
    np.testing.assert_allclose(
        np.asarray(los)[16:-16], np.asarray(jnp.roll(lo, 8))[16:-16], atol=1e-5
    )


@pytest.mark.parametrize("level", [1, 2, 3])
def test_iswt1_roundtrip_interior(level):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(256).astype(np.float64))
    coeffs = swt1(x, "cdf97", level)
    rec = iswt1(coeffs, "cdf97")
    m = 16 * (1 << level)  # borders differ (SWT clamps, DWT mirrors)
    np.testing.assert_allclose(np.asarray(rec)[m:-m], np.asarray(x)[m:-m], atol=1e-9)


@pytest.mark.parametrize("level", [1, 2])
def test_iswt2_roundtrip_interior(level):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(128, 96).astype(np.float64))
    coeffs = swt2(x, "cdf53", level)
    rec = iswt2(coeffs, "cdf53")
    m = 8 * (1 << level)
    np.testing.assert_allclose(
        np.asarray(rec)[m:-m, m:-m], np.asarray(x)[m:-m, m:-m], atol=1e-9
    )


def test_find_max_pos():
    a = np.zeros((5, 7), np.float32)
    a[3, 2] = 9.0
    v, y, x = find_max_pos(jnp.asarray(a))
    assert float(v) == 9.0 and int(y) == 3 and int(x) == 2


def test_iswt_rejects_nondivisible_length():
    import pytest

    from libdwt_tpu.ops.swt import iswt1, swt1

    x = jnp.asarray(np.random.RandomState(0).rand(1022).astype(np.float32))
    coeffs = swt1(x, "cdf97", 2)  # forward accepts any length
    with pytest.raises(ValueError, match="divisible"):
        iswt1(coeffs, "cdf97")
