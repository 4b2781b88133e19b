"""Streamed (manual-DMA) 3-D tile kernels vs the separable oracle."""
import numpy as np
import pytest

import jax.numpy as jnp
from libdwt_tpu.ops.separable import dwt3_level
from libdwt_tpu.ops.streamed3d import (
    streamed3d_supported,
    streamed_dwt3_level,
    streamed_idwt3_level,
)

# (z, y, x, tz, ty): ragged z/y tails included
GEOMS = [(32, 64, 128, 16, 32), (30, 72, 128, 16, 32),
         (32, 70, 128, 16, 32), (24, 48, 256, 8, 16)]


def _rand(z, y, x, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    if np.issubdtype(dtype, np.integer):
        return jnp.asarray(rng.randint(-512, 512, (z, y, x)).astype(dtype))
    return jnp.asarray(rng.rand(z, y, x).astype(dtype))


@pytest.mark.parametrize("z,y,x,tz,ty", GEOMS)
def test_streamed3d_fwd_vs_oracle(z, y, x, tz, ty):
    v = _rand(z, y, x)
    got = streamed_dwt3_level(v, "cdf97", strip_z=tz, strip_y=ty,
                              interpret=True)
    want = dwt3_level(v, "cdf97")
    d = max(float(jnp.abs(got[k] - want[k]).max()) for k in want)
    assert d < 3e-6, d


@pytest.mark.parametrize("z,y,x,tz,ty", GEOMS)
def test_streamed3d_roundtrip(z, y, x, tz, ty):
    v = _rand(z, y, x)
    bands = streamed_dwt3_level(v, "cdf97", strip_z=tz, strip_y=ty,
                                interpret=True)
    rec = streamed_idwt3_level(bands, "cdf97", strip_z=tz, strip_y=ty,
                               interpret=True)
    assert float(jnp.abs(rec - v).max()) < 5e-6


@pytest.mark.parametrize("wavelet", ["cdf53", "cdf97", "haar"])
def test_streamed3d_int_bit_exact(wavelet):
    vi = _rand(30, 72, 128, np.int32)
    got = streamed_dwt3_level(vi, wavelet, strip_z=16, strip_y=32,
                              interpret=True)
    want = dwt3_level(vi, wavelet)
    assert max(int(jnp.abs(got[k] - want[k]).max()) for k in want) == 0
    rec = streamed_idwt3_level(got, wavelet, strip_z=16, strip_y=32,
                               interpret=True)
    assert int(jnp.abs(rec - vi).max()) == 0


def test_streamed3d_poly_approach():
    v = _rand(32, 64, 128)
    got = streamed_dwt3_level(v, "cdf97", strip_z=16, strip_y=32,
                              interpret=True, approach="poly")
    want = dwt3_level(v, "cdf97")
    d = max(float(jnp.abs(got[k] - want[k]).max()) for k in want)
    assert d < 3e-6, d
    rec = streamed_idwt3_level(got, "cdf97", strip_z=16, strip_y=32,
                               interpret=True, approach="poly")
    assert float(jnp.abs(rec - v).max()) < 5e-6


def test_streamed3d_gate():
    assert streamed3d_supported((32, 64, 128), "cdf97", 16, 32)
    assert not streamed3d_supported((31, 64, 128), "cdf97", 16, 32)
    assert not streamed3d_supported((32, 64, 128), "d4", 16, 32)
    with pytest.raises(ValueError):
        streamed_dwt3_level(_rand(31, 64, 128), "cdf97", interpret=True)


# ------------------------------------------------ review-regression cases


def test_min_volume_guard():
    # z == HZ: the head mirror would read a z-row the DMA never wrote
    assert not streamed3d_supported((4, 512, 128), "cdf97")
    v = _rand(4, 512, 128)
    with pytest.raises(ValueError):
        streamed_dwt3_level(v, "cdf97", interpret=True)
    # inverse: channel depth == CZ
    bands = {n: _rand(2, 32, 64, seed=i) for i, n in enumerate(
        ("LLL", "LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH"))}
    with pytest.raises(ValueError):
        streamed_idwt3_level(bands, "cdf97", interpret=True)


def test_small_strip_z_clamps_to_halo():
    # strip_z=2 < HZ would clamp later tiles' DMA starts without the
    # head mirror; the tile picker must raise it to HZ and stay correct
    v = _rand(16, 64, 128, seed=3)
    got = streamed_dwt3_level(v, "cdf97", strip_z=2, interpret=True)
    want = dwt3_level(v, "cdf97")
    d = max(float(jnp.abs(got[n] - want[n]).max()) for n in got)
    assert d < 3e-6
    rec = streamed_idwt3_level(got, "cdf97", strip_z=2, interpret=True)
    assert float(jnp.abs(rec - v).max()) < 3e-6


@pytest.mark.slow
def test_supported_gate_respects_itemsize():
    # the gate must size tiles with the real dtype: if it approves a
    # geometry at a given itemsize, the kernel must accept it
    shape = (64, 1024, 512)
    for itemsize, dtype in ((4, np.float32), (8, np.float64)):
        if streamed3d_supported(shape, "cdf97", itemsize=itemsize):
            v = _rand(*shape, dtype=dtype, seed=5)
            streamed_dwt3_level(v, "cdf97", interpret=True)


def test_inverse_rejects_mismatched_bands():
    bands = {n: _rand(16, 32, 64, seed=i) for i, n in enumerate(
        ("LLL", "LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH"))}
    bands["LHH"] = _rand(8, 32, 64, seed=9)
    with pytest.raises(ValueError):
        streamed_idwt3_level(bands, "cdf97", interpret=True)
