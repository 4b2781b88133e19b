"""Streamed (manual-DMA) strip kernels vs the separable oracle.

Same matrix as test_fused: float to tolerance, integers bit-exactly,
ragged last strips, short-tail penultimate-strip geometry, pyramids.
Interpret mode on CPU (the compiled path is exercised on the TPU by
bench.py's gates).
"""
import numpy as np
import pytest

import jax.numpy as jnp
from libdwt_tpu.ops.separable import dwt2_level, idwt2_level
from libdwt_tpu.ops.separable import wavedec2 as sep_wavedec2
from libdwt_tpu.ops.streamed import (
    streamed_dwt2_level,
    streamed_dwt2_2level,
    streamed_idwt2_level,
    streamed_idwt2_2level,
    streamed_supported,
    streamed_wavedec2,
    streamed_waverec2,
)

FTOL = 3e-6
# (h, w, strip_rows): includes ragged last strips and the short-tail
# penultimate-strip margin cases
GEOMS = [(256, 256, 64), (288, 128, 64), (260, 128, 64), (200, 128, 32),
         (204, 128, 64), (512, 384, 128)]


def _rand(h, w, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    if np.issubdtype(dtype, np.integer):
        return jnp.asarray(rng.randint(-512, 512, (h, w)).astype(dtype))
    return jnp.asarray(rng.rand(h, w).astype(dtype))


def _maxdiff(a, b):
    import jax

    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


@pytest.mark.parametrize("h,w,ty", GEOMS)
def test_streamed_fwd_vs_oracle(h, w, ty):
    x = _rand(h, w)
    got = streamed_dwt2_level(x, "cdf97", strip_rows=ty, interpret=True)
    want = dwt2_level(x, "cdf97")
    assert _maxdiff(got, want) < FTOL


@pytest.mark.parametrize("h,w,ty", GEOMS)
def test_streamed_inv_roundtrip(h, w, ty):
    x = _rand(h, w)
    bands = dwt2_level(x, "cdf97")
    got = streamed_idwt2_level(*bands, wavelet="cdf97", strip_rows=ty,
                               interpret=True)
    assert float(jnp.abs(got - x).max()) < FTOL
    want = idwt2_level(*bands, wavelet="cdf97")
    assert float(jnp.abs(got - want).max()) < FTOL


@pytest.mark.parametrize("h,w,ty", GEOMS)
def test_streamed_2lvl_fwd_vs_oracle(h, w, ty):
    if h % 4 or w % 4:
        pytest.skip("2-level kernel needs dims divisible by 4")
    x = _rand(h, w)
    got = streamed_dwt2_2level(x, "cdf97", strip_rows=ty, interpret=True)
    ll1, hl1, lh1, hh1 = dwt2_level(x, "cdf97")
    ll2, hl2, lh2, hh2 = dwt2_level(ll1, "cdf97")
    want = (ll2, (hl2, lh2, hh2), (hl1, lh1, hh1))
    assert _maxdiff(got, want) < 1e-5


@pytest.mark.parametrize("h,w,ty", GEOMS)
def test_streamed_2lvl_inv_roundtrip(h, w, ty):
    if h % 4 or w % 4:
        pytest.skip("2-level kernel needs dims divisible by 4")
    x = _rand(h, w)
    ll1, hl1, lh1, hh1 = dwt2_level(x, "cdf97")
    ll2, hl2, lh2, hh2 = dwt2_level(ll1, "cdf97")
    # body="poly": the tight tolerance is the VPU polyphase body's; the
    # MXU body (the float32 'auto' default) is covered at its own
    # tolerance in tests/test_banded.py
    got = streamed_idwt2_2level(ll2, (hl2, lh2, hh2), (hl1, lh1, hh1),
                                wavelet="cdf97", strip_rows=ty,
                                interpret=True, body="poly")
    assert float(jnp.abs(got - x).max()) < 1e-5


@pytest.mark.parametrize("kernelpair", ["1lvl", "2lvl"])
@pytest.mark.parametrize("wavelet", ["cdf53", "cdf97", "haar"])
def test_streamed_int_bit_exact(kernelpair, wavelet):
    h, w = 200, 128
    xi = _rand(h, w, np.int32)
    if kernelpair == "1lvl":
        got = streamed_dwt2_level(xi, wavelet, strip_rows=32, interpret=True)
        want = dwt2_level(xi, wavelet)
        assert _maxdiff(got, want) == 0
        rec = streamed_idwt2_level(*got, wavelet=wavelet, strip_rows=32,
                                   interpret=True)
    else:
        got = streamed_dwt2_2level(xi, wavelet, strip_rows=64, interpret=True)
        ll1, hl1, lh1, hh1 = dwt2_level(xi, wavelet)
        ll2, hl2, lh2, hh2 = dwt2_level(ll1, wavelet)
        assert _maxdiff(got, (ll2, (hl2, lh2, hh2), (hl1, lh1, hh1))) == 0
        rec = streamed_idwt2_2level(*got, wavelet=wavelet, strip_rows=64,
                                    interpret=True)
    assert int(jnp.abs(rec - xi).max()) == 0


@pytest.mark.parametrize("level", [2, 3, 5])
def test_streamed_pyramid_roundtrip(level):
    h, w = 256, 320
    x = _rand(h, w)
    coeffs = streamed_wavedec2(x, "cdf97", level, strip_rows=64,
                               interpret=True)
    want = sep_wavedec2(x, "cdf97", level)
    # deep-level leaves accumulate float association error
    assert _maxdiff(coeffs, want) < 5e-5
    rec = streamed_waverec2(coeffs, "cdf97", strip_rows=64, interpret=True)
    assert float(jnp.abs(rec - x).max()) < 5e-5


def test_streamed_geometry_gate():
    assert not streamed_supported((63, 128), "cdf97", 64)
    assert not streamed_supported((96, 128), "cdf97", 0)  # too short
    assert not streamed_supported((128, 127), "cdf97", 32)
    assert not streamed_supported((16384, 128), "cdf97", 0)  # > MAX_STRIPS
    assert streamed_supported((128, 128), "cdf97", 0)  # adaptive strips
    assert streamed_supported((256, 128), "cdf97", 64)
    assert not streamed_supported((256, 128), "d4", 64)  # asymmetric steps
    with pytest.raises(ValueError):
        streamed_dwt2_level(_rand(127, 128), "cdf97", strip_rows=32,
                            interpret=True)


# ------------------------------------------------------- seeded geometry fuzz

_FRNG = np.random.RandomState(20260818)
# arbitrary even geometries and strip sizes: the static per-strip
# margin/bump arithmetic is exactly where bugs would hide
_FUZZ = []
while len(_FUZZ) < 14:
    h = 2 * int(_FRNG.randint(40, 260))
    w = 2 * int(_FRNG.randint(40, 140))
    ty = 16 * int(_FRNG.randint(2, 12))
    if h > ty + 48 and 2 <= -(-h // max(64, (ty // 32) * 32)) <= 32:
        _FUZZ.append((h, w, ty))


@pytest.mark.parametrize("h,w,ty", _FUZZ)
def test_streamed_fuzz_1lvl(h, w, ty):
    x = _rand(h, w, seed=h * 31 + w)
    got = streamed_dwt2_level(x, "cdf97", strip_rows=ty, interpret=True)
    want = dwt2_level(x, "cdf97")
    assert _maxdiff(got, want) < FTOL
    rec = streamed_idwt2_level(*want, wavelet="cdf97", strip_rows=ty,
                               interpret=True)
    assert float(jnp.abs(rec - x).max()) < FTOL


@pytest.mark.parametrize("h,w,ty", [g for g in _FUZZ if not (g[0] % 4 or g[1] % 4)][:8])
def test_streamed_fuzz_2lvl(h, w, ty):
    x = _rand(h, w, seed=h * 37 + w)
    ll1, hl1, lh1, hh1 = dwt2_level(x, "cdf97")
    ll2, hl2, lh2, hh2 = dwt2_level(ll1, "cdf97")
    got = streamed_dwt2_2level(x, "cdf97", strip_rows=ty, interpret=True)
    assert _maxdiff(got, (ll2, (hl2, lh2, hh2), (hl1, lh1, hh1))) < 1e-5
    rec = streamed_idwt2_2level(ll2, (hl2, lh2, hh2), (hl1, lh1, hh1),
                                wavelet="cdf97", strip_rows=ty,
                                interpret=True, body="poly")
    assert float(jnp.abs(rec - x).max()) < 1e-5


# ------------------------------------------------ whole-pyramid single launch

from libdwt_tpu.ops.streamed import streamed_deep_ok, streamed_wavedec2_deep


@pytest.mark.parametrize("h,w,J,ty", [(256, 320, 4, 64), (512, 384, 5, 128),
                                      (260, 256, 3, 64)])
def test_streamed_deep_pyramid(h, w, J, ty):
    from libdwt_tpu.ops.streamed import pick_strip, tail_aligned

    x = _rand(h, w, seed=h + J)
    # the dispatch gate excludes last strips that are not 32-aligned
    # (Mosaic DMA constraint, compiled path only); interpret mode still
    # covers the ragged geometry below
    assert streamed_deep_ok((h, w), 4, "cdf97", J, ty) == tail_aligned(
        h, pick_strip(h, ty))
    got = streamed_wavedec2_deep(x, "cdf97", J, strip_rows=ty, interpret=True)
    want = sep_wavedec2(x, "cdf97", J)
    assert _maxdiff(got, want) < 5e-5
    rec = streamed_waverec2(got, "cdf97", strip_rows=ty, interpret=True)
    assert float(jnp.abs(rec - x).max()) < 5e-5


def test_streamed_deep_int_bit_exact():
    xi = _rand(256, 320, np.int32)
    got = streamed_wavedec2_deep(xi, "cdf53", 4, strip_rows=64, interpret=True)
    want = sep_wavedec2(xi, "cdf53", 4)
    assert _maxdiff(got, want) == 0


def test_streamed_wavedec2_uses_deep():
    # the pyramid driver must produce identical structure either way
    x = _rand(256, 320, seed=9)
    via_driver = streamed_wavedec2(x, "cdf97", 4, strip_rows=64,
                                   interpret=True)
    want = sep_wavedec2(x, "cdf97", 4)
    assert _maxdiff(via_driver, want) < 5e-5


from libdwt_tpu.ops.streamed import streamed_waverec2_deep


@pytest.mark.parametrize("h,w,J,ty", [(256, 320, 4, 64), (512, 384, 5, 128),
                                      (260, 256, 3, 64)])
def test_streamed_deep_inverse(h, w, J, ty):
    x = _rand(h, w, seed=h ^ J)
    c = sep_wavedec2(x, "cdf97", J)
    rec = streamed_waverec2_deep(c, "cdf97", strip_rows=ty, interpret=True)
    assert float(jnp.abs(rec - x).max()) < 5e-5
    # and through the driver
    rec2 = streamed_waverec2(c, "cdf97", strip_rows=ty, interpret=True)
    assert float(jnp.abs(rec2 - x).max()) < 5e-5


def test_streamed_deep_inverse_int():
    xi = _rand(256, 320, np.int32, seed=4)
    ci = sep_wavedec2(xi, "cdf53", 4)
    ri = streamed_waverec2_deep(ci, "cdf53", strip_rows=64, interpret=True)
    assert int(jnp.abs(ri - xi).max()) == 0


# ------------------------------------------------ review-regression cases


def test_deep_inverse_short_quarter_tail():
    # 1036 rows, J=3: remq = ceil(1036/256)*64 - 259 = 3 rows in the last
    # quarter-strip, inside the CFIX margin — needs the tyw_q tail bump
    # (regression: AssertionError at trace time before the fix)
    x = _rand(1036, 128, seed=11)
    c = sep_wavedec2(x, "cdf97", 3)
    rec = streamed_waverec2(c, "cdf97", interpret=True)
    assert float(jnp.abs(rec - x).max()) < 5e-5


def test_pick_strip_aligns_preferred():
    # a 66-row preference must not leak through unaligned (ty % 4 == 0
    # is load-bearing for the 2-level quarter-row accounting)
    from libdwt_tpu.ops.streamed import pick_strip

    assert pick_strip(1000, 66) == 64
    assert pick_strip(1000, 250) == 224
    x = _rand(1000, 128, seed=12)
    ll2, b2, b1 = streamed_dwt2_2level(x, "cdf97", strip_rows=66,
                                       interpret=True)
    want_ll, *_ = dwt2_level(x, "cdf97")
    got_ll, *_ = dwt2_level(want_ll, "cdf97")
    assert float(jnp.abs(ll2 - got_ll).max()) < 5e-5


def test_deep_inverse_rejects_bad_pytree():
    # mismatched coarse triples must raise ValueError (not crash in DMA)
    x = _rand(256, 320, seed=13)
    c = sep_wavedec2(x, "cdf97", 4)
    bad = [c[0], tuple(jnp.zeros((7, 9), jnp.float32) for _ in range(3))] \
        + list(c[2:])
    with pytest.raises(ValueError):
        streamed_waverec2_deep(bad, "cdf97", interpret=True)
    # the pyramid driver falls through to the level loop instead
    rec = streamed_waverec2(c, "cdf97", interpret=True)
    assert float(jnp.abs(rec - x).max()) < 5e-5


def test_single_level_inverse_rejects_mismatched_bands():
    ll = jnp.zeros((128, 64), jnp.float32)
    bad = jnp.zeros((96, 64), jnp.float32)
    with pytest.raises(ValueError):
        streamed_idwt2_level(ll, bad, ll, ll, interpret=True)


def test_resolve_inv_body_geometry_gated():
    """'auto' must keep the exact polyphase synthesis wherever it
    compiles and only fall to the bf16-split MXU body at the 4K-class
    float32 geometries where Mosaic OOM-kills the polyphase compile
    (ADVICE r3: the precision drop must not leak to small frames)."""
    from libdwt_tpu.ops.streamed import (
        _resolve_inv_body, poly_inv_compile_safe,
    )

    assert poly_inv_compile_safe(2048, 2048)  # observed compiling
    assert not poly_inv_compile_safe(2144, 4096)  # observed OOM
    f32 = jnp.float32
    assert _resolve_inv_body("auto", "cdf97", f32, (1024, 1024)) == "poly"
    assert _resolve_inv_body("auto", "cdf97", f32, (2048, 2048)) == "poly"
    assert _resolve_inv_body("auto", "cdf97", f32, (2144, 4096)) == "mxu"
    # integers stay bit-exact polyphase at every geometry
    assert _resolve_inv_body("auto", "cdf53", jnp.int32,
                             (2144, 4096)) == "poly"
    # explicit requests pass through
    assert _resolve_inv_body("mxu", "cdf97", f32, (256, 256)) == "mxu"
    assert _resolve_inv_body("poly", "cdf97", f32, (8192, 8192)) == "poly"


def test_copy_body_not_reachable_by_name():
    """The timing-only control body is underscore-prefixed; the old
    public name must raise (ADVICE r3: a typo'd caller must not get
    mathematically wrong coefficients silently)."""
    x = _rand(256, 256)
    with pytest.raises(ValueError, match="unknown kernel body"):
        streamed_dwt2_2level(x, "cdf97", strip_rows=64, interpret=True,
                             body="copy")


def test_tail_alignment_gate():
    """The geometry that crashed Mosaic on hardware (bench r4: level 3
    of a 4K pyramid, 536 rows, ty=256 -> last strip 24 rows, 12-row
    stage DMA slice, 'must be aligned to tiling (8)').  The dispatch
    gate must exclude it; the compiled kernel must refuse it; interpret
    mode (no tiling) keeps accepting ragged geometry."""
    from libdwt_tpu.ops.streamed import streamed_supported, tail_aligned

    assert not tail_aligned(536, 256)
    assert not streamed_supported((536, 1024), "cdf97", 256, levels=1)
    assert tail_aligned(2144, 256)
    assert streamed_supported((2144, 4096), "cdf97", 256, levels=1)
    x = _rand(536, 1024)
    with pytest.raises(ValueError, match="32-aligned"):
        streamed_dwt2_level(x, "cdf97", strip_rows=256, interpret=False)
    got = streamed_dwt2_level(x, "cdf97", strip_rows=256, interpret=True)
    want = dwt2_level(x, "cdf97")
    assert _maxdiff(got, want) < FTOL


def test_extended_mode_dma_windows_sublane_aligned():
    """ADVICE r04: boundary_rows='extended' used to extend by the
    4-row analysis halo, shifting every strip DMA window to 4 mod 8 —
    breaking the Mosaic 8-alignment invariant tail_aligned guards.
    The contract is now a TOP(8)-row extension: every source start,
    length and buffer offset is 8-aligned for all supported
    geometries."""
    from libdwt_tpu.ops.streamed import TOP, _strip_geom, pick_strip

    for h in (512, 1024, 2144, 4096, 544):
        for preferred in (128, 256, 320, 416, 480):
            ty = pick_strip(h, preferred)
            ny = -(-h // ty)
            if ny < 2:
                continue
            # forward: signal-domain windows over h + 2*TOP rows
            for i in range(ny):
                _, s, L, o = _strip_geom(i, h + 2 * TOP, ty, TOP,
                                         origin=TOP)
                rem = h - (ny - 1) * ty
                if rem % 32 == 0:  # the compiled-path tail gate
                    assert s % 8 == 0 and L % 8 == 0 and o % 8 == 0, (
                        h, ty, i, s, L, o)
            # inverse: channel-domain windows over cy + 2*TOP rows
            hy, cy = ty // 2, h // 2
            for i in range(ny):
                _, s, L, o = _strip_geom(i, cy + 2 * TOP, hy, TOP,
                                         origin=TOP)
                rem = h - (ny - 1) * ty
                if rem % 32 == 0:
                    assert s % 8 == 0 and L % 8 == 0 and o % 8 == 0, (
                        h, ty, i, s, L, o)
