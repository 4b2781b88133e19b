"""Vector/image utility tests (dwt_util_* math helpers)."""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu.utils import vecops as V


def test_basic_math():
    a = jnp.asarray([1.0, -2.0, 3.0])
    b = jnp.asarray([2.0, 0.5, -1.0])
    np.testing.assert_allclose(np.asarray(V.vec_abs(a)), [1, 2, 3])
    assert float(V.dot(a, b)) == 2 - 1 - 3
    np.testing.assert_allclose(np.asarray(V.add(a, b)), [3, -1.5, 2])
    np.testing.assert_allclose(np.asarray(V.mul(a, b)), [2, -1, -3])
    mn, mx = V.find_min_max(a)
    assert float(mn) == -2 and float(mx) == 3
    np.testing.assert_allclose(np.asarray(V.shift(a, 1.0)), [2, -1, 4])


def test_normalize_l2():
    x = jnp.asarray([3.0, 4.0])
    out = np.asarray(V.normalize(x, 2.0))
    np.testing.assert_allclose(out, [0.6, 0.8], atol=1e-6)


def test_scale_minmax():
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(V.scale(x, 0, 1)), [0, 0.5, 1])
    np.testing.assert_allclose(np.asarray(V.scale(x, -1, 1)), [-1, 0, 1])


def test_scale21_per_row():
    x = jnp.asarray([[0.0, 2.0], [10.0, 30.0]])
    out = np.asarray(V.scale21(x, 0, 1))
    np.testing.assert_allclose(out, [[0, 1], [0, 1]])


def test_shift21_med():
    x = jnp.asarray([[1.0, 2.0, 5.0], [10.0, 10.0, 10.0]])
    out = np.asarray(V.shift21_med(x))
    # reference median = sorted[n//2] -> 2 and 10
    np.testing.assert_allclose(out, [[-1, 0, 3], [0, 0, 0]])


def test_displace_clamp_and_zero():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    # out[i] = x[clamp(i + d)]
    np.testing.assert_allclose(np.asarray(V.displace1(x, 1)), [2, 3, 4, 4])
    np.testing.assert_allclose(np.asarray(V.displace1(x, -2)), [1, 1, 1, 2])
    np.testing.assert_allclose(np.asarray(V.displace1_zero(x, 1)), [2, 3, 4, 0])
    np.testing.assert_allclose(np.asarray(V.displace1_zero(x, -2)), [0, 0, 1, 2])


def test_center1_moves_peak_to_middle():
    x = np.zeros(32, np.float32)
    x[5] = 1.0
    out = V.center1(x)
    assert np.argmax(out) == 16


def test_center21_rows():
    x = np.zeros((2, 32), np.float32)
    x[0, 3] = 1.0
    x[1, 28] = 1.0
    out = V.center21(x)
    assert np.argmax(out[0]) == 16 and np.argmax(out[1]) == 16


def test_viewport_crop():
    x = jnp.arange(24.0).reshape(4, 6)
    v = V.viewport(x, 1, 2, 2, 3)
    assert v.shape == (2, 3) and float(v[0, 0]) == 8.0
    c = V.crop21(x, 2, 3)
    assert c.shape == (4, 3) and float(c[0, 0]) == 2.0
