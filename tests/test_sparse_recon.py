"""Sparse-reconstruction border modes vs the compiled reference.

The reference ships three inverse families for reconstruction from
sparse coefficient sets (/root/reference/src/libdwt.h:889-933):
plain whole-point mirror (dwt_cdf97_2i_inplace_s), 'hole'
(dwt_cdf97_2i_inplace_hole_s — virtual neighbours contribute zero) and
'zero' (dwt_cdf97_2i_inplace_zero_s — virtual zero samples that lift).
Golden vectors run all three on (a) the full coefficient set and (b) an
LL-only set (every detail zeroed); our waverec2(border=...) must match.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from libdwt_tpu import wavedec2
from libdwt_tpu.api import waverec2
from libdwt_tpu.ops.lifting import lift_fwd, lift_inv
from libdwt_tpu.utils.subband import zero_padding_f, zero_padding_i

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="golden vectors not generated"
)


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


CASES = [(32, 32, 2), (16, 16, 2), (64, 48, 3)]


def _ll_only(coeffs):
    return [coeffs[0]] + [
        tuple(jnp.zeros_like(b) for b in lvl) for lvl in coeffs[1:]
    ]


@pytest.mark.parametrize("ny,nx,j", CASES)
@pytest.mark.parametrize("border", ["mirror", "hole", "zero"])
@pytest.mark.parametrize("subset", ["full", "llonly"])
def test_sparse_inverse_matches_reference(g, ny, nx, j, border, subset):
    src = g[f"sparse_src_f32_{ny}x{nx}_j{j}"]
    want = g[f"sparse_{border}_{subset}_f32_{ny}x{nx}_j{j}"]
    coeffs = wavedec2(jnp.asarray(src), "cdf97", j)
    if subset == "llonly":
        coeffs = _ll_only(coeffs)
    rec = waverec2(coeffs, "cdf97", border=border)
    np.testing.assert_allclose(np.asarray(rec), want, atol=5e-4, rtol=0)


@pytest.mark.parametrize("border", ["hole", "zero"])
def test_sparse_modes_differ_from_mirror_at_borders_only(border):
    """Full-coefficient reconstructions agree with mirror away from the
    image border (the modes differ only in virtual-sample handling)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(32, 32).astype(np.float32))
    coeffs = wavedec2(x, "cdf97", 1)
    rec_m = waverec2(coeffs, "cdf97", border="mirror")
    rec_b = waverec2(coeffs, "cdf97", border=border)
    assert not np.allclose(np.asarray(rec_m), np.asarray(rec_b))
    np.testing.assert_allclose(
        np.asarray(rec_m)[8:-8, 8:-8], np.asarray(rec_b)[8:-8, 8:-8],
        atol=1e-5, rtol=0,
    )


@pytest.mark.parametrize("border", ["mirror", "hole", "zero"])
def test_sparse_modes_int_path(border):
    """The int engine supports the same border modes (reference ships
    float-only; int follows the identical neighbour semantics)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(-1000, 1000, 33).astype(np.int32))
    lo, hi = lift_fwd(x, "cdf53")
    rec = lift_inv(lo, hi, "cdf53", border=border)
    assert rec.shape == x.shape and rec.dtype == x.dtype
    if border == "mirror":
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_zero_padding_helpers():
    """dwt_zero_padding_f/i analogues zero channel tails beyond the
    valid lengths (/root/reference/src/libdwt.h:412-524)."""
    l = jnp.ones((4, 10), jnp.float32)
    h = jnp.ones((4, 10), jnp.float32)
    lz, hz = zero_padding_f(l, h, 13)  # ceil=7 low, floor=6 high valid
    np.testing.assert_array_equal(np.asarray(lz[:, :7]), 1.0)
    np.testing.assert_array_equal(np.asarray(lz[:, 7:]), 0.0)
    np.testing.assert_array_equal(np.asarray(hz[:, :6]), 1.0)
    np.testing.assert_array_equal(np.asarray(hz[:, 6:]), 0.0)
    lz2 = zero_padding_i(l, 7)
    np.testing.assert_array_equal(np.asarray(lz2), np.asarray(lz))
