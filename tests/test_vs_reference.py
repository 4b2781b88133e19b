"""Parity tests against golden vectors produced by the compiled reference
library (.refbuild/gen_golden.c runs the reference's own transforms with
accel=0 plain-C kernels and dumps inputs/outputs; see tests/make_golden.py).

Integer transforms must match BIT-EXACTLY; float transforms to tight
tolerance (identical step order, differing only in FP association inside
a vectorized step).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from libdwt_tpu import dwt1, fdwt2, idwt2

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="golden vectors not generated"
)


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


SIZES_1D = [2, 3, 5, 7, 8, 15, 16, 17, 37, 64, 100]


@pytest.mark.parametrize("n", SIZES_1D)
@pytest.mark.parametrize(
    "wavelet,prec,tol",
    [
        ("cdf97", "f32", 2e-5),
        ("cdf53", "f32", 2e-5),
        ("interp53", "f32", 2e-5),
        ("cdf97", "f64", 1e-12),
        ("cdf53", "f64", 1e-12),
    ],
)
def test_1d_forward_matches_reference(g, n, wavelet, prec, tol):
    key = f"{wavelet}_{prec}_{n}"
    if f"{key}_L" not in g:
        pytest.skip("combo not dumped")
    x = g[f"x_{prec}_{n}"][0]
    lo, hi = dwt1(jnp.asarray(x), wavelet)
    np.testing.assert_allclose(np.asarray(lo), g[f"{key}_L"][0], atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(hi), g[f"{key}_H"][0], atol=tol, rtol=0)


@pytest.mark.parametrize("n", SIZES_1D)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_1d_int_forward_bitexact_vs_reference(g, n, wavelet):
    x = g[f"x_i32_{n}"][0]
    lo, hi = dwt1(jnp.asarray(x), wavelet)
    np.testing.assert_array_equal(np.asarray(lo), g[f"{wavelet}_i32_{n}_L"][0])
    np.testing.assert_array_equal(np.asarray(hi), g[f"{wavelet}_i32_{n}_H"][0])


CASES_2D_F32 = [
    (16, 16, 1),
    (16, 16, 3),
    (17, 13, 2),
    (32, 32, 5),
    (33, 31, 4),
    (64, 48, None),  # reference called with j=-1 -> clamped to j_limit
]


@pytest.mark.parametrize("ny,nx,j", CASES_2D_F32)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_2d_forward_matches_reference(g, ny, nx, j, wavelet):
    jname = j if j is not None else -1
    key = f"{wavelet}_2f_f32_{ny}x{nx}_j{jname}"
    if key not in g:
        pytest.skip("combo not dumped")
    img = g[f"img_f32_{ny}x{nx}"]
    got = np.asarray(fdwt2(jnp.asarray(img), wavelet, j))
    np.testing.assert_allclose(got, g[key], atol=5e-4, rtol=0)


@pytest.mark.parametrize("ny,nx,j", [(16, 16, 3), (17, 13, 2), (32, 32, 5)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_2d_int_forward_bitexact_vs_reference(g, ny, nx, j, wavelet):
    key = f"{wavelet}_2f_i32_{ny}x{nx}_j{j}"
    img = g[f"img_i32_{ny}x{nx}"]
    got = np.asarray(fdwt2(jnp.asarray(img), wavelet, j))
    np.testing.assert_array_equal(got, g[key])


@pytest.mark.parametrize("ny,nx,j", [(16, 16, 3), (32, 32, 5), (33, 31, 4)])
def test_2d_inverse_matches_reference(g, ny, nx, j):
    """Our inverse applied to the REFERENCE's forward output must reproduce
    the reference's own inverse result (which is ~the original image)."""
    fwd = g[f"cdf97_2f_f32_{ny}x{nx}_j{j}"]
    ref_rec = g[f"cdf97_2i_f32_{ny}x{nx}_j{j}"]
    got = np.asarray(idwt2(jnp.asarray(fwd), "cdf97", j))
    np.testing.assert_allclose(got, ref_rec, atol=5e-4, rtol=0)


SIZES_EAW = [8, 15, 16, 17, 64, 100]


@pytest.mark.parametrize("n", SIZES_EAW)
def test_eaw97_forward_matches_reference(g, n):
    """Weighted lifting vs the reference's dwt_eaw97_f_ex_stride_s
    (/root/reference/src/eaw-experimental.c:73-187), alpha=0.8."""
    from libdwt_tpu.ops.eaw import eaw_lift_fwd

    key = f"eaw97_f32_{n}"
    if f"{key}_L" not in g:
        pytest.skip("combo not dumped")
    x = jnp.asarray(g[f"eawx_f32_{n}"][0])
    lo, hi, w = eaw_lift_fwd(x, "cdf97", alpha=0.8)
    np.testing.assert_allclose(np.asarray(lo), g[f"{key}_L"][0], atol=3e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(hi), g[f"{key}_H"][0], atol=3e-5, rtol=0)
    # weights: reference leaves w[N-1] unset ("not necessary"); ours
    # patches it — compare the first N-1
    np.testing.assert_allclose(
        np.asarray(w)[: n - 1], g[f"{key}_W"][0][: n - 1], rtol=2e-5
    )


@pytest.mark.parametrize("n", SIZES_EAW)
def test_eaw53_forward_matches_reference(g, n):
    from libdwt_tpu.ops.eaw import eaw_lift_fwd

    key = f"eaw53_f32_{n}"
    if f"{key}_L" not in g:
        pytest.skip("combo not dumped")
    x = jnp.asarray(g[f"eawx_f32_{n}"][0])
    lo, hi, _ = eaw_lift_fwd(x, "cdf53", alpha=0.8)
    np.testing.assert_allclose(np.asarray(lo), g[f"{key}_L"][0], atol=3e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(hi), g[f"{key}_H"][0], atol=3e-5, rtol=0)


@pytest.mark.parametrize("n", SIZES_EAW)
@pytest.mark.parametrize("wavelet,tag", [("cdf97", "swt97"), ("cdf53", "swt53")])
@pytest.mark.parametrize("level", [0, 1, 2])
def test_swt_level_matches_reference(g, n, wavelet, tag, level):
    """À-trous filtering vs swt_cdf97/53_f_ex_stride_s
    (/root/reference/src/swt.c:18-124)."""
    from libdwt_tpu.ops.swt import swt_level

    key = f"{tag}_f32_{n}_l{level}"
    if f"{key}_L" not in g:
        pytest.skip("combo not dumped")
    x = jnp.asarray(g[f"swtx_f32_{n}"][0])
    lo, hi = swt_level(x, wavelet, level=level)
    np.testing.assert_allclose(np.asarray(lo), g[f"{key}_L"][0], atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(hi), g[f"{key}_H"][0], atol=2e-5, rtol=0)


@pytest.mark.parametrize("ny,nx", [(16, 16), (32, 24)])
def test_eaw97_2d_forward_matches_reference(g, ny, nx):
    """Full 2-D EAW MRA vs dwt_eaw97_2f_s (packed in-place layout with
    per-level wH/wV weight arrays, /root/reference/src/eaw-experimental.c)."""
    from libdwt_tpu.ops.eaw import eaw_wavedec2

    key = f"eaw97_2f_f32_{ny}x{nx}_j2"
    if key not in g:
        pytest.skip("combo not dumped")
    img = jnp.asarray(g[f"eawimg_f32_{ny}x{nx}"])
    coeffs, wts = eaw_wavedec2(img, "cdf97", 2, alpha=0.8)
    # assemble our pytree into the packed layout
    packed = np.array(g[key])  # template for shape
    out = np.zeros_like(packed)
    ll = np.asarray(coeffs[0])
    j = 2
    # place detail bands coarse-to-fine
    cur = ll
    for lvl_idx, (hl, lh, hh) in enumerate(coeffs[1:]):
        top = np.concatenate([cur, np.asarray(hl)], axis=1)
        bot = np.concatenate([np.asarray(lh), np.asarray(hh)], axis=1)
        cur = np.concatenate([top, bot], axis=0)
    np.testing.assert_allclose(cur, g[key], atol=5e-5, rtol=0)
    # per-level weights match too (wH[j] laid out row-major per row).
    # w = 1/(|d|^a + eps) is unboundedly sensitive where |d| ~ 0, so
    # compare the well-conditioned reciprocals (|d|^a + eps) instead.
    for lvl in range(2):
        wh, wv = wts[len(wts) - 1 - lvl]  # wts is coarse-first
        ref_wh = g[f"{key}_wH{lvl}"]
        # reference leaves w[N-1] unset per row; compare [:, :-1]
        np.testing.assert_allclose(
            1.0 / np.asarray(wh)[:, :-1], 1.0 / ref_wh[:, :-1], atol=2e-5
        )
        ref_wv = g[f"{key}_wV{lvl}"]  # stored (x, y): per-column rows
        np.testing.assert_allclose(
            1.0 / np.asarray(wv).T[:, :-1], 1.0 / ref_wv[:, :-1], atol=2e-5
        )


def test_eaw97_2d_inverse_matches_reference(g):
    """Our inverse with our weights reproduces the reference's inverse
    result (the original image, eaw97_2i dump)."""
    from libdwt_tpu.ops.eaw import eaw_wavedec2, eaw_waverec2

    img = jnp.asarray(g["eawimg_f32_16x16"])
    coeffs, wts = eaw_wavedec2(img, "cdf97", 2, alpha=0.8)
    rec = eaw_waverec2(coeffs, wts, "cdf97")
    np.testing.assert_allclose(
        np.asarray(rec), g["eaw97_2i_f32_16x16_j2"], atol=5e-5, rtol=0
    )
