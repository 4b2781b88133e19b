"""2-D fixed-point transforms vs the float oracle (VERDICT r04 #8).

The reference's cores example runs its Q-format 2-D transforms and
verifies them by comparison maps + MSE against the float path
(/root/reference/examples/cores/main.c:53-84); these tests hold
utils.fix.dwt2_fix/idwt2_fix to the same standard, at each format's
quantization-derived tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libdwt_tpu.ops.separable import dwt2_level, idwt2_level
from libdwt_tpu.utils.fix import (
    FIX16,
    FIX32,
    dwt2_fix,
    from_fix,
    idwt2_fix,
    to_fix,
)


def _img(h, w, seed=0):
    return np.random.RandomState(seed).rand(h, w).astype(np.float32)


# quantization step is 2^-n; lifting accumulates a few steps per pass
# and two passes per direction.  FIX32 (n=16) stays ~1e-4 absolute on
# [0,1) data; FIX16 (n=9, step ~2e-3) a few quantization steps.
_TOL = {FIX32.name: 2e-3, FIX16.name: 6e-2}
_ROUNDTRIP_TOL = {FIX32.name: 1e-3, FIX16.name: 4e-2}


@pytest.mark.parametrize("q", [FIX32, FIX16], ids=["fix32", "fix16"])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
@pytest.mark.parametrize("shape", [(64, 64), (48, 96), (33, 47)])
def test_dwt2_fix_matches_float_oracle(q, wavelet, shape):
    x = _img(*shape)
    got = jax.jit(
        lambda a: dwt2_fix(to_fix(a, q), wavelet, q), static_argnums=()
    )(jnp.asarray(x))
    want = dwt2_level(jnp.asarray(x), wavelet)
    for g, w_ in zip(got, want):
        err = np.abs(from_fix(np.asarray(g), q) - np.asarray(w_)).max()
        assert err <= _TOL[q.name], (q.name, wavelet, shape, err)


@pytest.mark.parametrize("q", [FIX32, FIX16], ids=["fix32", "fix16"])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_fix2d_roundtrip(q, wavelet):
    x = _img(64, 80, seed=3)
    xf = to_fix(jnp.asarray(x), q)
    bands = dwt2_fix(xf, wavelet, q)
    rec = idwt2_fix(*bands, wavelet, q)
    err = np.abs(from_fix(np.asarray(rec), q) - x).max()
    assert err <= _ROUNDTRIP_TOL[q.name], (q.name, wavelet, err)


def test_fix2d_idwt_matches_float_oracle():
    """Synthesis from FLOAT-derived bands: quantize the oracle's bands,
    run the fixed-point inverse, compare to the float inverse."""
    x = _img(64, 64, seed=5)
    bands = dwt2_level(jnp.asarray(x), "cdf97")
    bq = [to_fix(b, FIX32) for b in bands]
    rec = idwt2_fix(*bq, "cdf97", FIX32)
    want = idwt2_level(*bands, "cdf97")
    err = np.abs(from_fix(np.asarray(rec), FIX32) - np.asarray(want)).max()
    assert err <= 2e-3, err


def test_fix2d_batched():
    x = np.random.RandomState(7).rand(3, 32, 40).astype(np.float32)
    got = dwt2_fix(to_fix(jnp.asarray(x), FIX32), "cdf53", FIX32)
    for i in range(3):
        per = dwt2_fix(to_fix(jnp.asarray(x[i]), FIX32), "cdf53", FIX32)
        for g, p in zip(got, per):
            np.testing.assert_array_equal(np.asarray(g[i]), np.asarray(p))
