"""Non-separable (NSLS) lifting variant vs the separable oracle.

The merged 2-D stages equal the separable transform exactly in real
arithmetic (x-steps and y-steps are I(x)B and A(x)I tensor operators and
commute); float results differ only in rounding — the same relationship
the reference's NSLS cores have to its separable transforms
(/root/reference/examples/cores/cores-nsls.c, verified there by MSE in
examples/cores/main.c:53-84).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import dwt2_level, idwt2_level
from libdwt_tpu.ops.nsls import nsls_dwt2_level, nsls_idwt2_level
from libdwt_tpu.utils.testimg import test_image as make_test_image

SIZES = [(16, 16), (32, 32), (33, 31), (64, 48)]


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53", "interp53"])
def test_nsls_forward_matches_separable_f64(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float64))
    want = dwt2_level(x, wavelet)
    got = nsls_dwt2_level(x, wavelet)
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11, rtol=0)


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_nsls_inverse_matches_separable_f64(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float64))
    bands = dwt2_level(x, wavelet)
    got = nsls_idwt2_level(*bands, wavelet)
    want = idwt2_level(*bands, wavelet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-11, rtol=0)


def test_nsls_roundtrip_f32():
    x = jnp.asarray(make_test_image(64, 64, dtype=np.float32))
    bands = nsls_dwt2_level(x, "cdf97")
    rec = nsls_idwt2_level(*bands, "cdf97")
    assert float(np.abs(np.asarray(rec) - np.asarray(x)).max()) < 1e-3


def test_nsls_batched():
    x = jnp.asarray(
        np.stack([make_test_image(32, 32, dtype=np.float64),
                  make_test_image(32, 32, rand=1, dtype=np.float64)])
    )
    got = nsls_dwt2_level(x, "cdf53")
    want = dwt2_level(x, "cdf53")
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_nsls_rejects_asymmetric():
    x = jnp.zeros((16, 16), jnp.float64)
    with pytest.raises(ValueError, match="symmetric"):
        nsls_dwt2_level(x, "d4")


def test_nsls_inverse_batched_matches_oracle():
    # _merged_step rolls axes 0/1, which are batch axes for batched
    # input; the inverse must vmap like the forward does
    x = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32)
                    .astype(np.float32))
    bands = dwt2_level(x, "cdf53")
    rec = nsls_idwt2_level(*bands, "cdf53")
    assert float(jnp.abs(rec - x).max()) < 1e-5


def test_nsls_inverse_rejects_tiny_bands():
    x = jnp.asarray(np.random.RandomState(5).rand(8, 8).astype(np.float32))
    bands = dwt2_level(x, "cdf97")
    with pytest.raises(ValueError):
        nsls_idwt2_level(*bands, "cdf97")
