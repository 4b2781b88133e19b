"""I/O codecs (native + Python fallback) and Image/Volume abstractions."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu.image import Image, Volume, conv_show
from libdwt_tpu.utils import io as dio
from libdwt_tpu.utils import nativelib


def test_native_lib_builds_and_loads():
    assert nativelib.available(), "native backend should build in this env"


def test_pgm_roundtrip_p2(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(13, 17).astype(np.float32)
    p = str(tmp_path / "t.pgm")
    dio.save_pgm(p, img, maxval=255)
    back = dio.load_pgm(p)
    assert back.shape == img.shape
    # reference PGM save TRUNCATES (libdwt.c:19794), so the
    # quantization error bound is a full step, not half
    assert np.abs(back - img).max() <= 1.0 / 255 + 1e-6


def test_pgm_roundtrip_p5(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(8, 9).astype(np.float32)
    p = str(tmp_path / "t5.pgm")
    dio.save_pgm(p, img, binary=True)
    back = dio.load_pgm(p)
    # truncation quantizer (reference semantics): full-step bound
    assert np.abs(back - img).max() <= 1.0 / 255 + 1e-6


def test_pgm_python_fallback_matches_native(tmp_path):
    img = np.arange(20, dtype=np.float32).reshape(4, 5) / 20
    p = str(tmp_path / "t.pgm")
    dio.save_pgm(p, img, maxval=1000)
    a = dio.load_pgm(p)
    b = dio._load_pgm_py(p, normalize=True)
    np.testing.assert_allclose(a, b)


def test_mat_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    a = rng.randn(7, 11).astype(np.float32)
    p = str(tmp_path / "m.mat")
    dio.save_mat(p, a)
    back = dio.load_mat(p)
    assert back.shape == a.shape
    # "%f" prints 6 decimals
    assert np.abs(back - a).max() < 1e-5


def test_mat_format_matches_reference_convention(tmp_path):
    """',' delimiters, '\\n' rows, %f values (libdwt.c:24430-24473)."""
    p = str(tmp_path / "m.mat")
    dio.save_mat(p, np.array([[1.5, -2.0], [0.25, 3.0]], np.float32))
    text = open(p).read()
    assert text == "1.500000,-2.000000\n0.250000,3.000000\n"


def test_svm_roundtrip(tmp_path):
    labels = np.array([1, 2, 1], np.float32)
    feats = np.array([[0.5, 1.0], [2.0, 0.0], [3.5, -1.0]], np.float32)
    p = str(tmp_path / "f.svm")
    dio.save_svm(p, labels, feats)
    lb, fb = dio.load_svm(p)
    np.testing.assert_allclose(lb, labels)
    np.testing.assert_allclose(fb, feats)
    first = open(p).readline().strip()
    assert first == "1 1:0.5 2:1"


def test_image_fdwt_idwt_roundtrip():
    img = Image.test_pattern(64, 48)
    t = img.fdwt("cdf97", 3)
    assert t.j == 3
    back = t.idwt("cdf97")
    assert back.compare(img, eps=1e-3)
    assert img.psnr(back) > 60


def test_image_subband_view():
    img = Image.test_pattern(32, 32)
    t = img.fdwt("cdf53", 2)
    assert t.subband(1, "HH").shape == (16, 16)
    assert t.subband(2, "LL").shape == (8, 8)


def test_volume_roundtrip():
    v = Volume.fill_test(16, 16, 16)
    t = v.fdwt("cdf53", 2)
    back = t.idwt("cdf53")
    assert back.compare(v, eps=1e-3)


def test_conv_show_range():
    img = Image.test_pattern(32, 32)
    t = img.fdwt("cdf97", 2)
    view = conv_show(t.data)
    assert view.min() >= 0 and view.max() <= 1


def test_native_host_info():
    lib = nativelib.get()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes
    n = ctypes.c_int64()
    l1 = ctypes.c_int64()
    line = ctypes.c_int64()
    assert lib.ldt_host_info(ctypes.byref(n), ctypes.byref(l1), ctypes.byref(line)) == 0
    assert n.value >= 1


# ------------------------------------------------ review-regression cases


def test_pgm_file_ending_in_digit(tmp_path):
    # no trailing newline: the parser must not scan past the buffer
    p = str(tmp_path / "d.pgm")
    with open(p, "w") as f:
        f.write("P2\n2 2\n255\n0 10 20 30")
    np.testing.assert_array_equal(
        dio.load_pgm(p, normalize=False).ravel(), [0, 10, 20, 30])


def test_truncated_p5_rejected(tmp_path):
    p = str(tmp_path / "t.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n2 2\n255")  # header ends at EOF, no pixel bytes
    with pytest.raises(Exception):
        dio.load_pgm(p)


def test_ragged_mat_rejected(tmp_path):
    p = str(tmp_path / "r.mat")
    with open(p, "w") as f:
        f.write("1,2\n3,4,5")  # ragged final row, no trailing newline
    with pytest.raises(Exception):
        dio.load_mat(p)


def test_space_delimited_mat(tmp_path):
    p = str(tmp_path / "s.mat")
    with open(p, "w") as f:
        f.write("1 2\n3 4\n")
    np.testing.assert_array_equal(dio.load_mat(p), [[1, 2], [3, 4]])


def test_pgm_write_matches_reference_truncation(tmp_path):
    # dwt_util_save_to_pgm_s truncates 255*px (libdwt.c:19794); both
    # the native codec and the fallback must agree byte-for-byte
    img = np.asarray([[0.9999, 0.5, np.nan, -0.2, 1.5]], np.float32)
    p_native = str(tmp_path / "n.pgm")
    dio.save_pgm(p_native, img, maxval=255)
    body = open(p_native).read().split()[4:]
    assert body == ["254", "127", "0", "0", "255"]
