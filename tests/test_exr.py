"""Minimal native EXR codec (the reference's examples/hdr/exr.h subset)."""
import numpy as np
import pytest

from libdwt_tpu.utils.exr import read_exr, write_exr


def test_exr_roundtrip_rgb(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(17, 23, 3).astype(np.float32) * 4.0  # HDR-range values
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back, names = read_exr(p)
    assert names == ["R", "G", "B"]
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip_gray(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "g.exr")
    write_exr(p, img)
    back, names = read_exr(p)
    assert names == ["Y"]
    np.testing.assert_array_equal(back[:, :, 0], img)


def test_exr_magic_and_errors(tmp_path):
    p = str(tmp_path / "bad.exr")
    with open(p, "wb") as f:
        f.write(b"not an exr file")
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(p)


def test_exr_header_is_spec_shaped(tmp_path):
    """First bytes must be the OpenEXR magic + version 2 so real
    OpenEXR readers recognize the file."""
    p = str(tmp_path / "h.exr")
    write_exr(p, np.zeros((2, 2), np.float32))
    raw = open(p, "rb").read(8)
    import struct
    magic, version = struct.unpack("<ii", raw)
    assert magic == 20000630 and version == 2
