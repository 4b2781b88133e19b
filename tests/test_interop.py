"""Interop layer: flags API, resize_pot, multi-channel handling.

The reference's OpenCV binding operates on cv::Mat (channels-last,
/root/reference/src/cvdwt.cpp:303-406); these tests pin the analogous
conventions on numpy/torch arrays.
"""
import numpy as np
import pytest

from libdwt_tpu.interop import (
    DWT_FORWARD,
    DWT_INVERSE,
    resize_pot,
    transform,
    wtshow,
)


def test_resize_pot_keeps_channel_axis():
    img = np.random.RandomState(0).rand(200, 200, 3).astype(np.float32)
    out = np.asarray(resize_pot(img))
    assert out.shape == (256, 256, 3)


def test_resize_pot_2d_and_noop():
    img = np.random.RandomState(0).rand(100, 60).astype(np.float32)
    assert np.asarray(resize_pot(img)).shape == (128, 64)
    pot = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_pot(pot)), pot)


def test_transform_channels_last_roundtrip():
    img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    coeffs = transform(img, DWT_FORWARD, level=2)
    assert isinstance(coeffs, np.ndarray) and coeffs.shape == img.shape
    rec = transform(coeffs, DWT_INVERSE, level=2)
    assert np.abs(rec - img).max() <= 1e-4


def test_wtshow_range():
    img = np.random.RandomState(2).rand(64, 64).astype(np.float32)
    coeffs = transform(img, DWT_FORWARD, level=2)
    disp = np.asarray(wtshow(coeffs))
    assert disp.min() >= 0.0 and disp.max() <= 1.0


def test_torch_tensor_roundtrip():
    torch = pytest.importorskip("torch")
    img = torch.rand(64, 64, dtype=torch.float32)
    coeffs = transform(img, DWT_FORWARD, level=2)
    assert isinstance(coeffs, torch.Tensor)
    rec = transform(coeffs, DWT_INVERSE, level=2)
    assert float((rec - img).abs().max()) <= 1e-4
