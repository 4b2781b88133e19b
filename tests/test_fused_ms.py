"""Multi-scale (2-level) fused kernel vs the separable oracle.

The dwt-sym-ms.c analogue (/root/reference/src/dwt-sym-ms.c): two
decomposition levels per HBM pass.  Checked against wavedec2 for float
(tolerance) and int (bit-exact), across strip decompositions and the
edge cases of the level-1 border mirror fixup.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import wavedec2
from libdwt_tpu.ops.fused import (fused_dwt2_2level, fused_idwt2_2level, fused_wavedec2)
from libdwt_tpu.utils.testimg import test_image as make_test_image

SIZES = [(128, 128), (256, 192), (64, 256), (96, 96), (320, 128), (100, 64)]


def _leaves(t):
    return jax.tree_util.tree_leaves(t)


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53", "interp53"])
def test_2level_matches_oracle(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = wavedec2(x, wavelet, 2)
    got = fused_dwt2_2level(x, wavelet, strip_rows=64, interpret=True)
    for a, b in zip(_leaves(list(got)), _leaves(want)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=0)


@pytest.mark.parametrize("h,w", [(128, 128), (320, 128), (96, 64)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_2level_int_bitexact(h, w, wavelet):
    x = jnp.asarray(make_test_image(h, w, dtype=np.int32))
    want = wavedec2(x, wavelet, 2)
    got = fused_dwt2_2level(x, wavelet, strip_rows=64, interpret=True)
    for a, b in zip(_leaves(list(got)), _leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("strip", [32, 96, 128])
def test_2level_strip_invariance(strip):
    """Different strip decompositions agree to FP-association level
    (boundary outputs are computed at different window offsets)."""
    x = jnp.asarray(make_test_image(128, 96, dtype=np.float32))
    base = fused_dwt2_2level(x, "cdf97", strip_rows=128, interpret=True)
    got = fused_dwt2_2level(x, "cdf97", strip_rows=strip, interpret=True)
    for a, b in zip(_leaves(list(got)), _leaves(list(base))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=0)


@pytest.mark.parametrize("level", [1, 2, 3, 5])
def test_fused_wavedec2_matches_oracle(level):
    x = jnp.asarray(make_test_image(256, 160, dtype=np.float32))
    want = wavedec2(x, "cdf97", level)
    got = fused_wavedec2(x, "cdf97", level, interpret=True)
    for a, b in zip(_leaves(got), _leaves(want)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=0)


def test_2level_rejects_bad_geometry():
    x = jnp.asarray(make_test_image(130, 128, dtype=np.float32))
    with pytest.raises(ValueError, match="divisible by 4"):
        fused_dwt2_2level(x, "cdf97", interpret=True)


@pytest.mark.parametrize("h,w", SIZES[:4])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_2level_inverse_matches_oracle(h, w, wavelet):
    from libdwt_tpu import waverec2
    from libdwt_tpu.ops.fused import fused_idwt2_2level

    if h % 4 or w % 4:
        pytest.skip("2-level inverse needs div-4 geometry")
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    c = wavedec2(x, wavelet, 2)
    want = waverec2(c, wavelet)
    got = fused_idwt2_2level(c[0], c[1], c[2], wavelet, strip_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=0)


@pytest.mark.parametrize("h,w", [(128, 128), (320, 128)])
def test_2level_inverse_int_bitexact(h, w):
    from libdwt_tpu.ops.fused import fused_idwt2_2level

    x = jnp.asarray(make_test_image(h, w, dtype=np.int32))
    c = wavedec2(x, "cdf53", 2)
    got = fused_idwt2_2level(c[0], c[1], c[2], "cdf53", strip_rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


@pytest.mark.parametrize("level", [2, 3, 5])
def test_fused_waverec2_roundtrip(level):
    from libdwt_tpu.ops.fused import fused_waverec2

    x = jnp.asarray(make_test_image(256, 160, dtype=np.float32))
    c = wavedec2(x, "cdf97", level)
    rec = fused_waverec2(c, "cdf97", interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


@pytest.mark.parametrize("h,w,level", [(64, 64, 3), (67, 129, 3), (128, 96, 4)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_deep_pyramid_matches_oracle(h, w, level, wavelet):
    """The VMEM-resident deep-pyramid kernel (all levels, one launch)."""
    from libdwt_tpu.ops.fused import fused_deep_wavedec2

    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = wavedec2(x, wavelet, level)
    got = fused_deep_wavedec2(x, wavelet, level, interpret=True)
    for a, b in zip(_leaves(got), _leaves(want)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=0)


def test_deep_pyramid_int_bitexact():
    from libdwt_tpu.ops.fused import fused_deep_wavedec2

    x = jnp.asarray(make_test_image(64, 96, dtype=np.int32))
    want = wavedec2(x, "cdf53", 3)
    got = fused_deep_wavedec2(x, "cdf53", 3, interpret=True)
    for a, b in zip(_leaves(got), _leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("h", [132, 136, 140])
def test_2level_short_last_strip(h):
    """h % strip_rows leaves a short last strip: the PENULTIMATE
    strip's window crosses the image end and must mirror-fill too."""
    x = jnp.asarray(make_test_image(h, 64, dtype=np.float32))
    want = wavedec2(x, "cdf97", 2)
    got = fused_dwt2_2level(x, "cdf97", strip_rows=32, interpret=True)
    flat_w = [want[0]] + list(want[1]) + list(want[2])
    flat_g = [got[0]] + list(got[1]) + list(got[2])
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=0)


@pytest.mark.parametrize("h", [132, 136, 140])
def test_2level_inverse_short_last_strip(h):
    x = jnp.asarray(make_test_image(h, 64, dtype=np.float32))
    c = wavedec2(x, "cdf97", 2)
    rec = fused_idwt2_2level(c[0], c[1], c[2], "cdf97", strip_rows=32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


@pytest.mark.parametrize(
    "shape,levels",
    [((128, 256), 3), ((134, 256), 2), ((67, 128), 2), ((96, 96), 4),
     ((65, 129), 1)],
)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_deep_inverse_vs_oracle(shape, levels, wavelet):
    """fused_deep_waverec2 (whole tail in one VMEM-resident launch)
    reconstructs wavedec2 pyramids incl. odd geometries."""
    from libdwt_tpu.ops.fused import fused_deep_waverec2
    from libdwt_tpu.ops.separable import waverec2 as sep_waverec2

    x = jnp.asarray(make_test_image(*shape, dtype=np.float32))
    c = wavedec2(x, wavelet, levels)
    got = fused_deep_waverec2(c, wavelet, interpret=True)
    want = sep_waverec2(c, wavelet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=0)


def test_deep_inverse_int_bitexact():
    from libdwt_tpu.ops.fused import fused_deep_waverec2

    x = jnp.asarray(make_test_image(64, 96, dtype=np.int32))
    c = wavedec2(x, "cdf53", 3)
    rec = fused_deep_waverec2(c, "cdf53", interpret=True)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_deep_inverse_roundtrip_with_forward_kernel():
    """deep forward -> deep inverse round trip (the kernel pair)."""
    from libdwt_tpu.ops.fused import fused_deep_wavedec2, fused_deep_waverec2

    x = jnp.asarray(make_test_image(120, 200, dtype=np.float32))
    c = fused_deep_wavedec2(x, "cdf97", 3, interpret=True)
    rec = fused_deep_waverec2(c, "cdf97", interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4,
                               rtol=0)


# ------------------------------------------------ review-regression cases

from libdwt_tpu.ops.fused import fused_waverec2
from libdwt_tpu.ops.separable import wavedec2 as sep_wavedec2


def test_full_depth_roundtrip_through_fused():
    # J=6 on 256x256 leaves a 4x4 coarsest LL, below the deep tail's
    # channel-mirror minimum; the driver must reconstruct those levels
    # with the oracle (regression: silent 2.8e-2 corruption)
    import numpy as np

    x = jnp.asarray(np.random.RandomState(0).rand(256, 256).astype(np.float32))
    for j in (6, 8):  # 4x4 and 1x1 coarsest
        pyr = sep_wavedec2(x, "cdf97", j)
        rec = fused_waverec2(pyr, "cdf97", interpret=True)
        assert float(jnp.abs(rec - x).max()) < 5e-5, j


def test_deep_inverse_rejects_small_coarsest():
    import numpy as np

    x = jnp.asarray(np.random.RandomState(1).rand(256, 256).astype(np.float32))
    from libdwt_tpu.ops.fused import fused_deep_waverec2

    with pytest.raises(ValueError):
        fused_deep_waverec2(sep_wavedec2(x, "cdf97", 6), "cdf97",
                            interpret=True)


def test_wavedec2_2level_branch_asymmetric_wavelet_falls_back():
    import numpy as np

    x = jnp.asarray(np.random.RandomState(2).rand(1024, 64).astype(np.float32))
    got = fused_wavedec2(x, "d4", 2, interpret=True)
    want = sep_wavedec2(x, "d4", 2)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert float(jnp.abs(a - b).max()) == 0.0


def test_strip_rows_rejected_when_unaligned():
    import numpy as np

    x = jnp.asarray(np.random.RandomState(3).rand(128, 64).astype(np.float32))
    from libdwt_tpu.ops.fused import fused_dwt2_level, fused_idwt2_level

    with pytest.raises(ValueError):
        fused_dwt2_level(x, "cdf97", strip_rows=100, interpret=True)
