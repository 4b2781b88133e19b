"""Gabor / time-frequency analysis tests vs reference formulas."""
import math

import numpy as np
import pytest

from libdwt_tpu.ops import gabor as G


def test_atom_formula():
    """gabor_atom = sqrt(a/pi) e^{-a t^2} e^{+i w t} (gabor.c:8-21)."""
    v = G.gabor_atom(1.5, alpha=0.3, omega=0.7)
    want = math.sqrt(0.3 / math.pi) * math.exp(-0.3 * 1.5**2) * np.exp(1j * 0.7 * 1.5)
    assert abs(v - want) < 1e-12


def test_wavelet_scaling():
    """gabor_wavelet(t, s, f, a) = (1/|a|) atom(t/a) (gabor.c:36-50)."""
    t, sigma, f, a = 2.0, 1.5, 0.8, 2.5
    v = G.gabor_wavelet(t, sigma, f, a)
    want = G.gabor_atom(t / a, 1 / (2 * sigma * sigma), f) / a
    assert abs(v - want) < 1e-12


def test_gaussian_window_rule():
    """size = ceil(1 + 2*4*sigma*a), center = size//2 (gabor.c:70-93)."""
    assert G.gaussian_size(2.0, 1.0) == math.ceil(1 + 16.0)
    assert G.gaussian_center(2.0, 1.0) == G.gaussian_size(2.0, 1.0) // 2
    assert G.gaussian_size(1.0, 3.0) == math.ceil(1 + 24.0)


def _brute_plane(sig, kernels, out="mag"):
    """Direct cdot1_s loop (gabor.c:105-160) for small cases."""
    n = len(sig)
    plane = np.zeros((len(kernels), n), np.float64)
    for b, (taps, kc) in enumerate(kernels):
        K = len(taps)
        for i in range(n):
            left = -min(i, kc)
            right = min(n - 1 - i, K - 1 - kc)
            s = 0.0 + 0j
            for t in range(left, right + 1):
                s += sig[i + t] * np.conj(taps[kc + t])
            plane[b, i] = abs(s) if out == "mag" else np.angle(s)
    return plane


def test_tf_plane_matches_bruteforce():
    rng = np.random.RandomState(0)
    sig = rng.randn(40).astype(np.float64)
    sigma = 2.0
    kernels = []
    for y in range(8):
        freq = y / 8 * math.pi
        size = G.gaussian_size(sigma, 1.0)
        c = G.gaussian_center(sigma, 1.0)
        kernels.append((G.gabor_wavelet(np.arange(size) - c, sigma, freq, 1.0), c))
    want = _brute_plane(sig, kernels)[::-1, :]
    got = np.asarray(G.gabor_ft(sig, 8, sigma))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gabor_ft_finds_tone():
    """A pure tone's energy concentrates in the right frequency bin."""
    n, bins = 256, 64
    f_cycles = 0.125  # cycles/sample -> omega = 0.25*pi
    sig = np.cos(2 * math.pi * f_cycles * np.arange(n)).astype(np.float32)
    plane = np.asarray(G.gabor_ft(sig, bins, sigma=8.0))
    # bin y has freq y/bins*pi; omega=0.25*pi -> y=16 -> row bins-1-16
    row = plane[:, n // 2]
    peak = bins - 1 - int(np.argmax(row[::-1]))  # resolve flip
    got_bin = bins - 1 - np.argmax(plane[:, n // 2])
    assert abs(int(got_bin) - 16) <= 1


def test_gabor_wt_shapes_and_scale_map():
    sig = G.test_signal(128, 2)
    plane = G.gabor_wt(sig, 16, sigma=2.0, freq=math.pi / 2)
    assert plane.shape == (16, 128)
    assert G.gabor_scale(math.pi / 2, math.pi / 4) == 2.0
    assert G.gabor_freq(math.pi, 2.0) == math.pi / 2


def test_s_transform_shape():
    sig = G.test_signal(128, 0)
    plane = G.gabor_st(sig, 16)
    assert plane.shape == (16, 128)
    assert np.isfinite(plane).all()


def test_phase_derivative_wraps():
    ang = np.array([[0.0, 1.0, 1.0 - 2 * math.pi - 0.5]])
    d = np.asarray(G.phase_derivative(ang, limit=math.pi))
    assert d[0, 0] == 0
    assert abs(d[0, 1] - 1.0) < 1e-6
    # raw diff -2pi-0.5 wraps up by 2pi -> -0.5
    assert abs(d[0, 2] - (-0.5)) < 1e-5


def test_detect_ridges1_local_max():
    mag = np.array([[0.0, 1.0, 5.0, 1.0, 0.0]])
    r = np.asarray(G.detect_ridges1(mag, threshold=0.5))
    assert r[0, 2] > 0 and r[0, 1] == 0 and r[0, 3] == 0
    assert abs(r[0, 2] - 5.0 / (2 * math.pi)) < 1e-6


def test_detect_ridges2_sign():
    d = np.array([[0.0, -1.0, 1.0, -0.1, 0.0]])
    r = np.asarray(G.detect_ridges2(d, threshold=0.5))
    assert r[0, 1] > 0 and r[0, 2] == 0 and r[0, 3] == 0


def test_detect_ridges3_peak():
    mag = np.zeros((5, 7), np.float32)
    mag[2, 3] = 2.0
    r = np.asarray(G.detect_ridges3(mag, threshold=0.5))
    assert r[2, 3] > 0
    assert r.sum() == r[2, 3]  # only the peak fires


@pytest.mark.parametrize("t", [0, 1, 2, 3, 7, 8])
def test_signals_generate(t):
    s = G.test_signal(64, t)
    assert s.shape == (64,) and np.isfinite(s).all()


def test_tf_plane_batched():
    """Batched signals produce the same planes as per-signal calls."""
    rng = np.random.RandomState(5)
    sigs = rng.randn(3, 64).astype(np.float32)
    batch = np.asarray(G.gabor_ft(sigs, 8, sigma=4.0))
    assert batch.shape == (3, 8, 64)
    for i in range(3):
        single = np.asarray(G.gabor_ft(sigs[i], 8, sigma=4.0))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


# ------------------------------------------------ review-regression cases


def test_detect_ridges3_batched_matches_2d():
    # the batched gather previously sampled the y-offset at the wrong
    # column; per-image and batched calls must agree exactly
    from libdwt_tpu.ops.gabor import detect_ridges3

    rng = np.random.RandomState(7)
    m = rng.rand(3, 16, 20).astype(np.float32)
    batched = np.asarray(detect_ridges3(m))
    singles = np.stack([np.asarray(detect_ridges3(m[i])) for i in range(3)])
    np.testing.assert_array_equal(batched, singles)


def test_test_signal_sigma_integer_division():
    # reference uses C int division for sigma (gabor.c:498): size=100
    # must use sigma=12, not 12.5
    import numpy as np

    from libdwt_tpu.ops.gabor import gabor_function, test_signal

    got = test_signal(100, 7)
    i = np.arange(100, dtype=np.float64)
    want = np.real(gabor_function(i - 50, 100 // 8, 0.5))
    np.testing.assert_allclose(got, want, atol=0)


# --------------------------------------------------- strongest ridges


def test_strongest_ridges_recovers_isolated_components():
    # three isolated Gabor components at known (t, f) must come out as
    # the three strongest points (spectra-blobs pipeline)
    # suppression is matched, not exclusive: a strong component's side
    # lobes may legitimately outrank a weak one (the reference damps by
    # 1-g too), so recovery is checked within a small top-K, not top-3.
    # frequencies stay well clear of Nyquist: the f=0.5 S-atom is so
    # broadband (sigma_f ~ 0.11) that a real signal's +f and -f lines
    # BOTH land in it, and 2*exp(-(0.5-f)^2/(2*0.11^2)) outranks the
    # true row's ~1.0 response for any component above f ~ 0.37
    n, bins = 512, 64
    truth = []
    sig = np.zeros(n, np.float64)
    for k, f in enumerate((0.12, 0.22, 0.32)):
        t0 = (k + 1) * n // 4
        sig += np.real(G.gabor_function(np.arange(n) - t0, n / 32.0,
                                        2 * math.pi * f))
        truth.append((t0, bins - round(f / 0.5 * bins)))
    plane = G.gabor_st(sig.astype(np.float32), bins)
    pts = np.asarray(G.strongest_ridges(plane, 8))
    assert pts.shape == (8, 2)
    d = np.asarray(G.diff_points(np.asarray(truth, np.float32), pts))
    assert (d <= 4.0).all(), (truth, pts.tolist(), d)


def test_strongest_ridges_suppression_moves_on():
    # without suppression the argmax would repeat; all returned points
    # must be distinct columns for a single-component signal's top-2
    n, bins = 128, 16
    sig = np.real(G.gabor_function(np.arange(n) - 64, 8.0, math.pi / 2))
    plane = G.gabor_st(sig.astype(np.float32), bins)
    pts = np.asarray(G.strongest_ridges(plane, 4))
    assert len({(int(x), int(y)) for x, y in pts}) == 4


def test_strongest_ridges_rejects_non_2d():
    with pytest.raises(ValueError):
        G.strongest_ridges(np.zeros((2, 3, 4), np.float32), 1)


def test_diff_points_nearest_distance():
    ref = np.array([[0, 0], [10, 0]], np.float32)
    tst = np.array([[3, 4], [10, 1]], np.float32)
    d = np.asarray(G.diff_points(ref, tst))
    np.testing.assert_allclose(d, [5.0, 1.0], atol=1e-6)
