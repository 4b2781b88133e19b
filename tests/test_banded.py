"""Banded-matrix lifting operators vs the separable oracle.

The matrices (ops/banded.py) must reproduce the oracle's 1-D lifting —
same step order, same whole-point border rule, same scaling — up to
float reassociation (built in float64, applied as f32 matmul).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops import banded
from libdwt_tpu.ops.separable import dwt1, idwt1


def _interleave(lo, hi, n):
    out = np.zeros((n,) + lo.shape[1:], np.float64)
    out[0::2] = np.asarray(lo, np.float64)
    out[1::2] = np.asarray(hi, np.float64)
    return out


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53", "haar"])
@pytest.mark.parametrize("n", [16, 64, 130])
def test_lift_matrix_matches_oracle_forward(wavelet, n):
    n = n if n % 2 == 0 else n + 1
    rng = np.random.RandomState(0)
    x = rng.rand(n, 5).astype(np.float32)
    lo, hi = jax.jit(lambda a: dwt1(a, wavelet, axis=0))(jnp.asarray(x))
    want = _interleave(np.asarray(lo), np.asarray(hi), n)
    M = banded.lift_matrix(n, wavelet, edges=(True, True), dtype=np.float64)
    got = M @ x.astype(np.float64)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_lift_matrix_inverse_matches_oracle(wavelet):
    n = 64
    rng = np.random.RandomState(1)
    lo = rng.rand(n // 2, 3).astype(np.float32)
    hi = rng.rand(n // 2, 3).astype(np.float32)
    want = np.asarray(
        jax.jit(lambda a, b: idwt1(a, b, wavelet, axis=0))(
            jnp.asarray(lo), jnp.asarray(hi)
        )
    )
    Mi = banded.lift_matrix(n, wavelet, inverse=True, edges=(True, True),
                            dtype=np.float64)
    got = Mi @ _interleave(lo, hi, n)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_inverse_matrix_inverts_forward(wavelet):
    n = 96
    F = banded.lift_matrix(n, wavelet, edges=(True, True), dtype=np.float64)
    I_ = banded.lift_matrix(n, wavelet, inverse=True, edges=(True, True),
                            dtype=np.float64)
    assert np.abs(I_ @ F - np.eye(n)).max() < 1e-10


def test_banded_blocks_reconstruct_matrix():
    n = 480
    M = banded.lift_matrix(n, "cdf97", dtype=np.float64).astype(np.float32)
    blocks = banded.banded_blocks(M, block=128)
    rng = np.random.RandomState(2)
    x = rng.rand(n, 7).astype(np.float32)
    got = np.concatenate(
        [W.astype(np.float64) @ x[s:s + W.shape[1]].astype(np.float64)
         for W, s in blocks], axis=0
    )
    want = M.astype(np.float64) @ x.astype(np.float64)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-6
    # alignment invariants (Mosaic sublane rules)
    for W, s in blocks:
        assert s % 8 == 0 and W.shape[1] % 8 == 0


def test_apply_banded_matches_dense():
    n, c = 256, 64
    M = banded.lift_matrix(n, "cdf97", edges=(True, True))
    blocks = banded.banded_blocks(M.astype(np.float64), block=128)
    rng = np.random.RandomState(3)
    x = rng.rand(n, c).astype(np.float32)
    got = np.asarray(
        jax.jit(lambda a: banded.apply_banded(a, blocks))(jnp.asarray(x))
    )
    want = M.astype(np.float64) @ x.astype(np.float64)
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.parametrize("shape", [(256, 128), (288, 256), (260, 132)])
def test_streamed_2level_mxu_body_vs_oracle(shape):
    from libdwt_tpu.ops.separable import wavedec2
    from libdwt_tpu.ops.streamed import streamed_dwt2_2level

    h, w = shape
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(h, w).astype(np.float32))
    ll2, b2, b1 = streamed_dwt2_2level(x, "cdf97", interpret=True,
                                       body="mxu", strip_rows=64)
    want = jax.jit(lambda a: wavedec2(a, "cdf97", 2))(x)
    got = [ll2, b2, b1]
    for g, wref in zip(jax.tree_util.tree_leaves(got),
                       jax.tree_util.tree_leaves(want)):
        # bf16x3-split matmuls: ~2^-17 relative (see banded.apply_packed)
        assert np.abs(np.asarray(g) - np.asarray(wref)).max() < 2e-4


@pytest.mark.slow
def test_streamed_deep_mxu_body_vs_oracle():
    from libdwt_tpu.ops.separable import wavedec2
    from libdwt_tpu.ops.streamed import (
        streamed_wavedec2_deep, streamed_waverec2_deep,
    )

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    got = streamed_wavedec2_deep(x, "cdf97", 4, interpret=True, body="mxu",
                                 strip_rows=64)
    want = jax.jit(lambda a: wavedec2(a, "cdf97", 4))(x)
    for g, wref in zip(jax.tree_util.tree_leaves(got),
                       jax.tree_util.tree_leaves(want)):
        assert np.abs(np.asarray(g) - np.asarray(wref)).max() < 2e-4
    rec = streamed_waverec2_deep(
        [got[0]] + [tuple(b) for b in got[1:]], "cdf97",
        interpret=True, body="mxu", strip_rows=64)
    assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 5e-4


@pytest.mark.parametrize("shape", [(256, 128), (288, 256), (260, 144)])
def test_streamed_2level_inverse_mxu_body(shape):
    from libdwt_tpu.ops.separable import wavedec2
    from libdwt_tpu.ops.streamed import streamed_idwt2_2level

    h, w = shape
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(h, w).astype(np.float32))
    ll2, b2, b1 = jax.jit(
        lambda a: tuple(wavedec2(a, "cdf97", 2))
    )(x)
    rec = streamed_idwt2_2level(ll2, tuple(b2), tuple(b1), "cdf97",
                                interpret=True, body="mxu", strip_rows=64)
    # bf16x3-split matmuls: ~2^-17 relative (see banded.apply_packed)
    assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 2e-4


def test_api_streamed_mxu_impl():
    from libdwt_tpu.api import wavedec2, waverec2

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(512, 512).astype(np.float32))
    got = wavedec2(x, "cdf97", 3, impl="streamed-mxu")
    want = wavedec2(x, "cdf97", 3, impl="separable")
    for g, wref in zip(jax.tree_util.tree_leaves(got),
                       jax.tree_util.tree_leaves(want)):
        assert np.abs(np.asarray(g) - np.asarray(wref)).max() < 2e-4
    # reconstruction of the mxu coefficients round-trips (both bodies)
    rec = waverec2(got, "cdf97", impl="separable")
    assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 1e-4
    rec2 = waverec2(got, "cdf97", impl="streamed-mxu")
    assert np.abs(np.asarray(rec2) - np.asarray(x)).max() < 5e-4
    # ints raise
    xi = jnp.asarray(rng.randint(0, 255, (512, 512)).astype(np.int32))
    with pytest.raises(ValueError):
        wavedec2(xi, "cdf53", 2, impl="streamed-mxu")


def test_fill_matrices_match_mirror_helpers():
    from libdwt_tpu.ops.fused import (
        _mirror_head_sub, _mirror_head_sub_repeat,
        _mirror_tail_sub, _mirror_tail_sub_repeat,
    )

    n = 48
    rng = np.random.RandomState(4)
    x = rng.rand(n, 3).astype(np.float32)
    xd = jnp.asarray(x)
    cases = [
        (banded.fill_head_mirror(n, 8, 4), lambda a: _mirror_head_sub(a, 8, 4)),
        (banded.fill_head_mirror(n, 8, 4, repeat=True),
         lambda a: _mirror_head_sub_repeat(a, 8, 4)),
        (banded.fill_tail_mirror(n, 37, 6), lambda a: _mirror_tail_sub(a, 37, 6)),
        (banded.fill_tail_mirror(n, 37, 6, repeat=True),
         lambda a: _mirror_tail_sub_repeat(a, 37, 6)),
    ]
    for E, fn in cases:
        want = np.asarray(jax.jit(fn)(xd))
        got = E @ x.astype(np.float64)
        assert np.abs(got - want).max() == 0.0


@pytest.mark.parametrize("mode", ["two", "fused"])
def test_interleaved_dot_emissions_vs_oracle(mode, monkeypatch):
    """The 'two' (2-dot) and 'fused' (1-dot) bf16 split-product
    emissions must produce the same math as the default 3-dot mode —
    they exist to cut per-dot MXU overhead once Mosaic compiles them
    at scale (tools/repro_fused_dot.py probes the wall)."""
    from libdwt_tpu.ops import banded
    from libdwt_tpu.ops.separable import wavedec2
    from libdwt_tpu.ops.streamed import streamed_dwt2_2level

    monkeypatch.setattr(banded, "DOT_EMISSION", mode)
    # the emission mode is a module flag, invisible to the jit cache
    # key — retrace so this mode's matrices are actually built
    streamed_dwt2_2level.clear_cache()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(256, 256).astype(np.float32))
    out = streamed_dwt2_2level(x, "cdf97", interpret=True, body="mxu",
                               strip_rows=64)
    streamed_dwt2_2level.clear_cache()
    want = jax.jit(lambda a: wavedec2(a, "cdf97", 2))(x)
    for g, wref in zip(jax.tree_util.tree_leaves(out),
                       jax.tree_util.tree_leaves(want)):
        assert np.abs(np.asarray(g) - np.asarray(wref)).max() < 2e-4


@pytest.mark.parametrize("mode", ["two", "fused"])
def test_lane_paneled_dots_match_unpaneled(mode, monkeypatch):
    """VERDICT r04 #2: the interleaved emissions lane-panel wide
    operands (Mosaic's per-dot compile cost is ~quadratic in lane
    width).  A dot split along RHS lanes computes disjoint output
    columns, so results match the unpaneled dot up to the backend
    dot's internal reduction order (no cross-panel accumulation)."""
    from libdwt_tpu.ops import banded

    monkeypatch.setattr(banded, "DOT_EMISSION", mode)
    rng = np.random.RandomState(3)
    n, c = 64, 640  # c spans 3 panels at DOT_PANEL=256
    M = rng.randn(48, n).astype(np.float32)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    mats, metas = banded.pack_blocks(
        [tuple(banded.banded_blocks(M, block=48))], n)
    ref = jnp.asarray(banded.split_bf16(mats))

    def run():
        return np.asarray(jax.jit(
            lambda a: banded.apply_packed(a, ref, metas[0], upcast=True)
        )(x))

    monkeypatch.setattr(banded, "DOT_PANEL", 0)
    want = run()
    monkeypatch.setattr(banded, "DOT_PANEL", 256)
    got = run()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-5)
    # and the math itself matches the dense product to bf16-split tol
    dense = M @ np.asarray(x)
    assert np.abs(got - dense).max() < 2e-4 * np.abs(dense).max()


def test_lane_panels_cover_and_align():
    from libdwt_tpu.ops import banded

    for c in (128, 1024, 1152, 4096, 2176):
        panels = [(0, c)] if c <= 1024 else [
            (p, min(1024, c - p)) for p in range(0, c, 1024)]
        assert banded._lane_panels(c) == panels
        assert sum(w for _, w in banded._lane_panels(c)) == c


@pytest.mark.slow
def test_deep_mxu_multi_panel_two_emission(monkeypatch):
    """End-to-end deep streamed MXU kernel with the lane-paneled 'two'
    emission spanning multiple panels (w=2048 at DOT_PANEL=512): the
    4K compile-lever configuration, validated against the oracle in
    interpret mode."""
    from libdwt_tpu.ops import banded
    from libdwt_tpu.ops.streamed import (
        streamed_wavedec2_deep, streamed_waverec2_deep,
    )
    from libdwt_tpu.api import wavedec2

    monkeypatch.setattr(banded, "DOT_EMISSION", "two")
    monkeypatch.setattr(banded, "DOT_PANEL", 512)
    streamed_wavedec2_deep.clear_cache()
    streamed_waverec2_deep.clear_cache()
    try:
        x = jnp.asarray(
            np.random.RandomState(0).rand(1024, 2048).astype(np.float32))
        got = streamed_wavedec2_deep(x, "cdf97", 3, interpret=True,
                                     body="mxu")
        want = jax.jit(
            lambda a: wavedec2(a, "cdf97", 3, impl="separable"))(x)
        for g, w_ in zip(jax.tree_util.tree_leaves(got),
                         jax.tree_util.tree_leaves(want)):
            assert np.abs(np.asarray(g) - np.asarray(w_)).max() < 2e-3
        rec = streamed_waverec2_deep(got, "cdf97", interpret=True,
                                     body="mxu")
        assert float(jnp.max(jnp.abs(rec - x))) < 2e-3
    finally:
        streamed_wavedec2_deep.clear_cache()
        streamed_waverec2_deep.clear_cache()
