"""API dispatch layer and autotuner."""
import jax.numpy as jnp
import numpy as np
import pytest

import libdwt_tpu as dwt
from libdwt_tpu import api
from libdwt_tpu.autotune import autotune_dwt2, best_config, clear_cache
from libdwt_tpu.utils.testimg import test_image as make_test_image


def test_impl_global_setting():
    assert api.get_impl() == "auto"
    api.set_impl("separable")
    assert api.get_impl() == "separable"
    with pytest.raises(ValueError):
        api.set_impl("nope")
    api.set_impl("auto")


def test_explicit_impls_agree():
    x = jnp.asarray(make_test_image(64, 64, dtype=np.float32))
    a = api.wavedec2(x, "cdf97", 3, impl="separable")
    b = api.wavedec2(x, "cdf97", 3, impl="fused")
    import jax

    for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=3e-5, rtol=0)


def test_fused_impl_rejects_small():
    x = jnp.asarray(make_test_image(8, 8, dtype=np.float32))
    with pytest.raises(ValueError):
        api.dwt2(x, "cdf97", impl="fused")


def test_roundtrip_through_api():
    x = jnp.asarray(make_test_image(96, 80, dtype=np.float32))
    c = api.wavedec2(x, "cdf53", 2)
    r = api.waverec2(c, "cdf53")
    np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-3, rtol=0)


def test_autotune_caches_winner():
    clear_cache()
    cfg = autotune_dwt2((64, 64), "cdf97", trials=1)
    assert cfg["impl"] in ("separable", "fused")
    assert best_config((64, 64), "cdf97") == cfg
    # second call hits the cache (same object)
    assert autotune_dwt2((64, 64), "cdf97", trials=1) is cfg


def test_streamed_impl_agrees_and_rejects():
    import numpy as np

    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(3).rand(256, 320).astype(np.float32))
    a = api.wavedec2(x, "cdf97", 3, impl="separable")
    c = api.wavedec2(x, "cdf97", 3, impl="streamed")
    import jax

    for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(c)):
        assert float(jnp.abs(u - v).max()) < 5e-5
    rec = api.waverec2(c, "cdf97", impl="streamed")
    assert float(jnp.abs(rec - x).max()) < 5e-5
    # single level + inverse
    ll, hl, lh, hh = api.dwt2(x, "cdf97", impl="streamed")
    back = api.idwt2(ll, hl, lh, hh, "cdf97", impl="streamed")
    assert float(jnp.abs(back - x).max()) < 5e-6
    # odd geometry cannot run streamed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.dwt2(x[:255], "cdf97", impl="streamed")


def test_streamed3d_impl():
    import numpy as np

    import jax.numpy as jnp

    v = jnp.asarray(np.random.RandomState(5).rand(32, 64, 128).astype(np.float32))
    c = api.wavedec3(v, "cdf97", 2, impl="streamed")
    s = api.wavedec3(v, "cdf97", 2, impl="separable")
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(c), jax.tree_util.tree_leaves(s)):
        assert float(jnp.abs(a - b).max()) < 1e-5
    rec = api.waverec3(c, "cdf97", impl="streamed")
    assert float(jnp.abs(rec - v).max()) < 1e-5


# ------------------------------------------------ review-regression cases


def test_batched_explicit_impl_roundtrip():
    # waverec2 with an explicit fast impl on batched coefficients used
    # to re-apply the impl per level and raise on the tiny coarse level
    import numpy as np

    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64)
                    .astype(np.float32))
    c = api.wavedec2(x, "cdf97", 4, impl="fused")
    r = api.waverec2(c, "cdf97", impl="fused")
    assert float(jnp.abs(r - x).max()) < 1e-4


def test_explicit_fused3_honoured_or_raised():
    import numpy as np

    import jax.numpy as jnp

    v = jnp.asarray(np.random.RandomState(1).rand(16, 32, 64)
                    .astype(np.float32))
    c = api.wavedec3(v, "cdf97", 1, impl="fused")
    s = api.wavedec3(v, "cdf97", 1, impl="separable")
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(c), jax.tree_util.tree_leaves(s)):
        assert float(jnp.abs(a - b).max()) < 1e-5
    # odd geometry: explicit fused must raise, not silently degrade
    bad = jnp.asarray(np.random.RandomState(2).rand(15, 32, 64)
                      .astype(np.float32))
    import pytest

    with pytest.raises(ValueError):
        api.wavedec3(bad, "cdf97", 1, impl="fused")


def test_single_level_streamed_mxu_raises():
    """dwt2/idwt2 must honour-or-raise an explicit impl='streamed-mxu'
    (the MXU body only exists for the 2-level+ kernels); silently
    running the polyphase body would hide the precision difference
    (ADVICE r3)."""
    import numpy as np

    import jax.numpy as jnp
    from libdwt_tpu.api import dwt2, idwt2

    x = jnp.asarray(np.random.RandomState(0).rand(256, 256)
                    .astype(np.float32))
    with pytest.raises(ValueError, match="streamed-mxu"):
        dwt2(x, "cdf97", impl="streamed-mxu")
    from libdwt_tpu.ops.separable import dwt2_level

    bands = dwt2_level(x, "cdf97")
    with pytest.raises(ValueError, match="streamed-mxu"):
        idwt2(*bands, wavelet="cdf97", impl="streamed-mxu")


def test_auto_separable_choice_locks_all_levels(monkeypatch, tmp_path):
    """bench r4 hardware crash regression: with the top-level 'auto'
    choice = separable, the level loop must NOT re-dispatch coarser
    levels through their own buckets (level 3 of the 4K pyramid landed
    on a streamed kernel at an untuned 536-row geometry and died in
    Mosaic).  A separable choice is locked for the whole pyramid — the
    thing the dispatch table actually measured."""
    import json

    import jax
    import jax.numpy as jnp
    from libdwt_tpu import autotune
    from libdwt_tpu.api import wavedec2

    table = {autotune._device_kind(): {
        "2048:float32:cdf97": {"impl": "separable", "secs": {}},
        "1024:float32:cdf97": {"impl": "fused", "secs": {}},
        "512:float32:cdf97": {"impl": "streamed-mxu", "secs": {}},
    }}
    path = tmp_path / "tune.json"
    path.write_text(json.dumps(table))
    monkeypatch.setenv("LIBDWT_TPU_TUNE_FILE", str(path))
    monkeypatch.setattr("libdwt_tpu.api._on_tpu", lambda: True)
    autotune.clear_cache()
    try:
        jaxpr = jax.make_jaxpr(lambda a: wavedec2(a, "cdf97", 5))(
            jax.ShapeDtypeStruct((2144, 4096), jnp.float32))

        def prims(jx, out):
            for eqn in jx.eqns:
                out.add(eqn.primitive.name)
                for val in eqn.params.values():
                    vals = val if isinstance(val, (tuple, list)) else [val]
                    for v in vals:
                        inner = getattr(v, "jaxpr", None)
                        if inner is not None:
                            prims(inner, out)
            return out

        names = prims(jaxpr.jaxpr, set())
        assert "pallas_call" not in names, (
            "auto separable pyramid must not contain Pallas kernels")
    finally:
        autotune.clear_cache()


def test_untuned_device_auto_defaults_to_separable_at_4k(monkeypatch,
                                                         tmp_path):
    """VERDICT r04 weak #5: an untuned device kind used to get 'fused'
    at any size >= 1024 — a known-losing default at the headline 4K
    geometry (the only measured device shows separable winning at
    2048+).  The built-in threshold now routes >= _AUTO_FUSED_MAX to
    separable; the mid band keeps fused."""
    import jax.numpy as jnp
    from libdwt_tpu import autotune
    from libdwt_tpu.api import _pick_impl

    path = tmp_path / "tune.json"
    path.write_text("{}")
    monkeypatch.setenv("LIBDWT_TPU_TUNE_FILE", str(path))
    monkeypatch.setattr(autotune, "_device_kind",
                        lambda: "never-measured-tpu")
    monkeypatch.setattr("libdwt_tpu.api._on_tpu", lambda: True)
    autotune.clear_cache()
    try:
        assert _pick_impl(2144, 4096, "cdf97", None, jnp.float32,
                          "fwd", 5) == "separable"
        assert _pick_impl(4096, 4096, "cdf97", None, jnp.float32,
                          "inv", 5) == "separable"
        assert _pick_impl(1024, 1024, "cdf97", None, jnp.float32,
                          "fwd", 5) == "fused"
        assert _pick_impl(512, 512, "cdf97", None, jnp.float32,
                          "fwd", 5) == "separable"
    finally:
        autotune.clear_cache()


def test_wavedec3_kernel_bugs_surface(monkeypatch):
    """VERDICT r04 weak #4: api.wavedec3/waverec3 used to swallow ANY
    ValueError from a kernel and silently fall back to separable.  Only
    the documented support checks (ops.UnsupportedGeometry) may fall
    back; a genuine kernel bug must propagate."""
    import jax.numpy as jnp
    import libdwt_tpu.ops.fused3d as fused3d
    from libdwt_tpu.api import wavedec3, waverec3
    from libdwt_tpu.ops import UnsupportedGeometry
    from libdwt_tpu.ops.separable import dwt3_level

    v = jnp.asarray(np.random.RandomState(0).rand(16, 32, 32)
                    .astype(np.float32))
    monkeypatch.setattr("libdwt_tpu.api._on_tpu", lambda: True)

    def boom(*a, **k):
        raise ValueError("kernel bug: wrong carry shape")

    monkeypatch.setattr(fused3d, "fused_dwt3_level", boom)
    with pytest.raises(ValueError, match="kernel bug"):
        wavedec3(v, "cdf97", 1)

    def declines(*a, **k):
        raise UnsupportedGeometry("volume too small for the fused kernel")

    monkeypatch.setattr(fused3d, "fused_dwt3_level", declines)
    got = wavedec3(v, "cdf97", 1)
    want = dwt3_level(v, "cdf97")
    low = want.pop("LLL")
    assert np.allclose(np.asarray(got[0]), np.asarray(low))

    def boom_inv(*a, **k):
        raise ValueError("kernel bug: inverse")

    monkeypatch.setattr(fused3d, "fused_idwt3_level", boom_inv)
    with pytest.raises(ValueError, match="kernel bug"):
        waverec3(got, "cdf97")
