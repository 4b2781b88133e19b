"""Sharded multi-chip transforms vs the single-device oracle.

Runs on the virtual 8-device CPU mesh (conftest.py), mirroring the
reference's practice of validating accelerator paths against the plain
portable path (/root/reference/src/libdwt.c:9501-9504).  The sharded
result must match the unsharded separable oracle to float tolerance
(identical lifting arithmetic; only halo bookkeeping differs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdwt_tpu import wavedec2, waverec2
from libdwt_tpu.parallel import (
    make_mesh_2d,
    sharded_wavedec2,
    sharded_waverec2,
)
from libdwt_tpu.utils.testimg import test_image as make_test_image

# every test in this module jits a shard_map program over the virtual
# 8-device mesh — multi-minute compiles that dominate the suite's wall
# time; excluded from the fast lane (`-m 'not slow'`), kept in the gate
pytestmark = pytest.mark.slow


def _tree_allclose(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


MESHES = [(1, 8), (2, 4), (1, 4), (1, 2)]


@pytest.mark.parametrize("n_data,n_space", MESHES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53", "interp53"])
def test_sharded_forward_matches_oracle(n_data, n_space, wavelet):
    mesh = make_mesh_2d(n_data, n_space)
    level = 2
    h = n_space * (1 << level) * 8  # local rows at deepest level = 8 >= HALO
    w = 96
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = wavedec2(x, wavelet, level)
    got = sharded_wavedec2(x, wavelet, level, mesh=mesh)
    _tree_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("n_data,n_space", [(2, 4), (1, 8)])
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_sharded_roundtrip(n_data, n_space, wavelet):
    mesh = make_mesh_2d(n_data, n_space)
    level = 2
    h = n_space * (1 << level) * 8
    w = 64
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    coeffs = sharded_wavedec2(x, wavelet, level, mesh=mesh)
    rec = sharded_waverec2(coeffs, wavelet, mesh=mesh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


@pytest.mark.parametrize("wavelet", ["cdf97"])
def test_sharded_inverse_matches_oracle(wavelet):
    """Sharded inverse applied to oracle coefficients reproduces the image."""
    mesh = make_mesh_2d(2, 4)
    level = 3
    h = 4 * (1 << level) * 8
    w = 64
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    coeffs = wavedec2(x, wavelet, level)
    rec = sharded_waverec2(coeffs, wavelet, mesh=mesh)
    want = waverec2(coeffs, wavelet)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(want), atol=1e-4, rtol=0)


def test_sharded_batched_int():
    """Batch axis over 'data'; reversible int path stays bit-exact sharded."""
    mesh = make_mesh_2d(2, 4)
    level = 1
    h, w = 4 * 2 * 8, 32
    imgs = np.stack(
        [make_test_image(h, w, dtype=np.int32), make_test_image(h, w, rand=1, dtype=np.int32)]
    )
    x = jnp.asarray(imgs)
    want = wavedec2(x, "cdf53", level)
    got = sharded_wavedec2(x, "cdf53", level, mesh=mesh)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rec = sharded_waverec2(got, "cdf53", mesh=mesh)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_sharded_jit_compiles_once():
    """The whole sharded fwd+inv step compiles and runs under jit."""
    mesh = make_mesh_2d(1, 8)
    level = 2
    h, w = 8 * 4 * 8, 32
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))

    @jax.jit
    def step(x):
        c = sharded_wavedec2(x, "cdf97", level, mesh=mesh)
        return sharded_waverec2(c, "cdf97", mesh=mesh)

    rec = step(x)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_sharded_3d_matches_oracle(wavelet):
    from libdwt_tpu import wavedec3, waverec3
    from libdwt_tpu.parallel import sharded_wavedec3, sharded_waverec3

    mesh = make_mesh_2d(1, 4)
    level = 1
    z = 4 * 2 * 8  # local z at deepest level = 16 >= HALO
    x = jnp.asarray(
        np.random.RandomState(0).randn(z, 24, 20).astype(np.float32)
    )
    want = wavedec3(x, wavelet, level)
    got = sharded_wavedec3(x, wavelet, level, mesh=mesh)
    _tree_allclose(got, want, atol=1e-4)
    rec = sharded_waverec3(got, wavelet, mesh=mesh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


def test_sharded_3d_multilevel_batched():
    from libdwt_tpu import wavedec3
    from libdwt_tpu.parallel import sharded_wavedec3, sharded_waverec3

    mesh = make_mesh_2d(2, 4)
    level = 2
    z = 4 * 4 * 8
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, z, 16, 16).astype(np.float32)
    )
    want = wavedec3(x, "cdf97", level)
    got = sharded_wavedec3(x, "cdf97", level, mesh=mesh)
    _tree_allclose(got, want, atol=1e-4)
    rec = sharded_waverec3(got, "cdf97", mesh=mesh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_sharded_fused_matches_oracle(wavelet):
    """Per-shard fused Pallas kernel (halo-extended boundary mode) vs
    the unsharded oracle, on the virtual CPU mesh in interpret mode."""
    mesh = make_mesh_2d(1, 4)
    level = 2
    h = 4 * (1 << level) * 16  # local rows 64 at level 0, 32 at level 1
    w = 96
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = wavedec2(x, wavelet, level)
    got = sharded_wavedec2(
        x, wavelet, level, mesh=mesh, use_fused=True, interpret=True
    )
    _tree_allclose(got, want, atol=1e-4)


def test_sharded_fused_int_bitexact():
    mesh = make_mesh_2d(1, 4)
    h, w = 4 * 2 * 16, 64
    x = jnp.asarray(make_test_image(h, w, dtype=np.int32))
    want = wavedec2(x, "cdf53", 1)
    got = sharded_wavedec2(x, "cdf53", 1, mesh=mesh, use_fused=True, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_sharded_fused_inverse_matches_oracle(wavelet):
    """Per-shard fused Pallas INVERSE (channel-halo exchange +
    boundary_rows='extended') vs the unsharded round trip."""
    mesh = make_mesh_2d(1, 4)
    level = 2
    h = 4 * (1 << level) * 16
    w = 96
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    coeffs = wavedec2(x, wavelet, level)
    rec = sharded_waverec2(
        coeffs, wavelet, mesh=mesh, use_fused=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=0)


def test_sharded_fused_inverse_int_bitexact():
    mesh = make_mesh_2d(1, 4)
    h, w = 4 * 2 * 16, 64
    x = jnp.asarray(make_test_image(h, w, dtype=np.int32))
    coeffs = wavedec2(x, "cdf53", 1)
    rec = sharded_waverec2(
        coeffs, "cdf53", mesh=mesh, use_fused=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_sharded_fused_roundtrip_both_ways():
    mesh = make_mesh_2d(2, 4)
    level = 2
    h = 4 * (1 << level) * 16
    x = jnp.asarray(
        np.random.RandomState(2).randn(2, h, 128).astype(np.float32)
    )
    # batched inputs route per-level locals through the jnp path, but the
    # 2-D per-frame case must round-trip through both fused directions
    xf = x[0]
    c = sharded_wavedec2(xf, "cdf97", level, mesh=mesh, use_fused=True, interpret=True)
    rec = sharded_waverec2(c, "cdf97", mesh=mesh, use_fused=True, interpret=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(xf), atol=1e-3, rtol=0)


# ------------------------------------------------ review-regression cases


def test_d4_rejected_at_global_borders():
    # the physical edge mirror differs from lift_fwd's per-step
    # neighbour clamping for asymmetric-step wavelets; sharded results
    # would silently diverge from the oracle at global boundaries
    mesh = make_mesh_2d(1, 4)
    x = jnp.asarray(make_test_image(64, 32, dtype=np.float32))
    with pytest.raises(ValueError, match="symmetric"):
        sharded_wavedec2(x, "d4", 1, mesh=mesh)
    with pytest.raises(ValueError, match="symmetric"):
        sharded_waverec2(wavedec2(x, "d4", 1), "d4", mesh=mesh)


def test_haar_sharded_matches_oracle():
    # haar's clamped neighbours all carry zero weight, so the physical
    # mirror is exact — it stays allowed
    mesh = make_mesh_2d(1, 4)
    x = jnp.asarray(make_test_image(64, 32, dtype=np.float32))
    got = sharded_wavedec2(x, "haar", 1, mesh=mesh)
    _tree_allclose(got, wavedec2(x, "haar", 1), atol=1e-5)


def test_fused_inverse_minimum_rows_enforced():
    # h=64, n_space=4, level=2 leaves 4 local channel rows at the
    # deepest level — enough for the jnp path (HALO=4) but one short of
    # the fused inverse's FCH+1=5; use_fused must reject up front
    # instead of crashing inside the shard with a broadcast error
    mesh = make_mesh_2d(1, 4)
    x = jnp.asarray(make_test_image(64, 32, dtype=np.float32))
    with pytest.raises(ValueError, match=">= 5"):
        sharded_wavedec2(x, "cdf97", 2, mesh=mesh, use_fused=True)
    coeffs = wavedec2(x, "cdf97", 2)
    with pytest.raises(ValueError, match=">= 5"):
        sharded_waverec2(coeffs, "cdf97", mesh=mesh, use_fused=True,
                         interpret=True)
    # and the fused pair works one size up
    x2 = jnp.asarray(make_test_image(128, 32, dtype=np.float32))
    c2 = sharded_wavedec2(x2, "cdf97", 2, mesh=mesh, use_fused=True,
                          interpret=True)
    _tree_allclose(c2, wavedec2(x2, "cdf97", 2), atol=1e-4)
    r2 = sharded_waverec2(c2, "cdf97", mesh=mesh, use_fused=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(x2), atol=1e-4)


def test_use_fused_batched_supported():
    """Batched frames under the kernel paths launch one Pallas kernel
    per frame inside the shard (round-4 feature; the halo exchange
    still runs once per level for the whole batch)."""
    mesh = make_mesh_2d(2, 4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 128, 32)
                    .astype(np.float32))
    got = sharded_wavedec2(x, "cdf97", 1, mesh=mesh, use_fused=True,
                           interpret=True)
    _tree_allclose(got, wavedec2(x, "cdf97", 1), atol=1e-5)


def test_inverse_validates_pytree():
    mesh = make_mesh_2d(1, 4)
    x = jnp.asarray(make_test_image(128, 32, dtype=np.float32))
    coeffs = wavedec2(x, "cdf97", 2)
    bad = [coeffs[0], coeffs[1],
           tuple(jnp.zeros((16, 16), jnp.float32) for _ in range(3))]
    with pytest.raises(ValueError, match="chain"):
        sharded_waverec2(bad, "cdf97", mesh=mesh)


def test_make_mesh_2d_rejects_too_few_devices():
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(2, 8)


# ----------------------------------------------------- 2-D block sharding


from libdwt_tpu.parallel import make_mesh_blocks  # noqa: E402


BLOCK_MESHES = [(1, 2, 4), (2, 2, 2), (1, 4, 2)]


@pytest.mark.parametrize("n_data,n_rows,n_cols", BLOCK_MESHES)
@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_blocks_forward_matches_oracle(n_data, n_rows, n_cols, wavelet):
    mesh = make_mesh_blocks(n_data, n_rows, n_cols)
    level = 2
    h = n_rows * (1 << level) * 8
    w = n_cols * (1 << level) * 8
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    want = wavedec2(x, wavelet, level)
    got = sharded_wavedec2(x, wavelet, level, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    _tree_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_blocks_roundtrip(wavelet):
    mesh = make_mesh_blocks(1, 2, 4)
    level = 2
    h, w = 2 * 4 * 8, 4 * 4 * 8
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    coeffs = sharded_wavedec2(x, wavelet, level, mesh=mesh,
                              space_axis="rows", col_axis="cols")
    rec = sharded_waverec2(coeffs, wavelet, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               atol=1e-3, rtol=0)


def test_blocks_inverse_matches_oracle():
    """Block-sharded inverse applied to oracle coefficients."""
    from libdwt_tpu import waverec2 as wr2

    mesh = make_mesh_blocks(1, 2, 4)
    level = 2
    h, w = 2 * 4 * 8, 4 * 4 * 8
    x = jnp.asarray(make_test_image(h, w, dtype=np.float32))
    coeffs = wavedec2(x, "cdf97", level)
    rec = sharded_waverec2(coeffs, "cdf97", mesh=mesh,
                           space_axis="rows", col_axis="cols")
    want = wr2(coeffs, "cdf97")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(want),
                               atol=1e-4, rtol=0)


def test_blocks_batched_int_bitexact():
    """Batch over 'data', 2-D blocks over rows x cols, int reversible."""
    mesh = make_mesh_blocks(2, 2, 2)
    level = 1
    h, w = 2 * 2 * 8, 2 * 2 * 8
    imgs = np.stack([
        make_test_image(h, w, dtype=np.int32),
        make_test_image(h, w, rand=1, dtype=np.int32),
    ])
    x = jnp.asarray(imgs)
    want = wavedec2(x, "cdf53", level)
    got = sharded_wavedec2(x, "cdf53", level, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rec = sharded_waverec2(got, "cdf53", mesh=mesh,
                           space_axis="rows", col_axis="cols")
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_blocks_rejects_use_fused():
    mesh = make_mesh_blocks(1, 2, 4)
    x = jnp.asarray(make_test_image(64, 128, dtype=np.float32))
    with pytest.raises(ValueError, match="row sharding only"):
        sharded_wavedec2(x, "cdf97", 1, mesh=mesh, space_axis="rows",
                         col_axis="cols", use_fused=True)
    coeffs = wavedec2(x, "cdf97", 1)
    with pytest.raises(ValueError, match="row sharding only"):
        sharded_waverec2(coeffs, "cdf97", mesh=mesh, space_axis="rows",
                         col_axis="cols", use_fused=True)


def test_blocks_width_divisibility_enforced():
    mesh = make_mesh_blocks(1, 2, 4)
    x = jnp.asarray(make_test_image(64, 72, dtype=np.float32))  # 72 % 16 != 0
    with pytest.raises(ValueError, match="divisible"):
        sharded_wavedec2(x, "cdf97", 2, mesh=mesh, space_axis="rows",
                         col_axis="cols")


def test_make_mesh_blocks_rejects_too_few_devices():
    with pytest.raises(ValueError, match="devices"):
        make_mesh_blocks(2, 2, 4)


# --------------------------------------------------- 3-D (z, y) block sharding


@pytest.mark.parametrize("wavelet", ["cdf97", "cdf53"])
def test_blocks3d_forward_matches_oracle(wavelet):
    from libdwt_tpu import wavedec3
    from libdwt_tpu.parallel import sharded_wavedec3

    mesh = make_mesh_blocks(1, 2, 4)  # z over 'rows', y over 'cols'
    level = 1
    z, y, x = 2 * 2 * 8, 4 * 2 * 8, 20
    v = jnp.asarray(np.random.RandomState(0).randn(z, y, x)
                    .astype(np.float32))
    want = wavedec3(v, wavelet, level)
    got = sharded_wavedec3(v, wavelet, level, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    _tree_allclose(got, want, atol=1e-4)


def test_blocks3d_multilevel_roundtrip():
    from libdwt_tpu import wavedec3
    from libdwt_tpu.parallel import sharded_wavedec3, sharded_waverec3

    mesh = make_mesh_blocks(2, 2, 2)
    level = 2
    z, y, x = 2 * 4 * 8, 2 * 4 * 8, 16
    v = jnp.asarray(np.random.RandomState(1).randn(2, z, y, x)
                    .astype(np.float32))  # batch over 'data'
    coeffs = sharded_wavedec3(v, "cdf97", level, mesh=mesh,
                              space_axis="rows", col_axis="cols")
    want = wavedec3(v, "cdf97", level)
    _tree_allclose(coeffs, want, atol=1e-4)
    rec = sharded_waverec3(coeffs, "cdf97", mesh=mesh,
                           space_axis="rows", col_axis="cols")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(v),
                               atol=1e-3, rtol=0)


def test_blocks3d_int_bitexact():
    from libdwt_tpu import wavedec3
    from libdwt_tpu.parallel import sharded_wavedec3, sharded_waverec3

    mesh = make_mesh_blocks(1, 2, 4)
    z, y, x = 2 * 2 * 8, 4 * 2 * 8, 16
    v = jnp.asarray(
        np.random.RandomState(2).randint(-512, 512, (z, y, x), np.int32)
    )
    got = sharded_wavedec3(v, "cdf53", 1, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    want = wavedec3(v, "cdf53", 1)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rec = sharded_waverec3(got, "cdf53", mesh=mesh,
                           space_axis="rows", col_axis="cols")
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(v))


def test_blocks3d_y_divisibility_enforced():
    from libdwt_tpu.parallel import sharded_wavedec3

    mesh = make_mesh_blocks(1, 2, 4)
    v = jnp.asarray(np.random.RandomState(0).randn(64, 68, 16)
                    .astype(np.float32))  # 68 % (4*2) != 0
    with pytest.raises(ValueError, match="divisible"):
        sharded_wavedec3(v, "cdf97", 1, mesh=mesh,
                         space_axis="rows", col_axis="cols")


@pytest.mark.parametrize("seed", range(4))
def test_blocks_geometry_fuzz(seed):
    """Seeded geometry fuzz over mesh factorization, level count, odd
    widths-of-multiples and wavelet — the static margin arithmetic of
    the two-phase exchange must match the oracle everywhere."""
    rng = np.random.RandomState(100 + seed)
    n_rows, n_cols = [(2, 2), (2, 4), (4, 2), (2, 2)][seed]
    level = int(rng.randint(1, 3))
    wavelet = ["cdf97", "cdf53", "interp53", "cdf97"][seed]
    # sharded extents: exact multiples of n*2^level times a random
    # factor large enough for HALO at the deepest level
    h = n_rows * (1 << level) * int(rng.randint(4, 9)) * 2
    w = n_cols * (1 << level) * int(rng.randint(4, 9)) * 2
    mesh = make_mesh_blocks(1, n_rows, n_cols)
    x = jnp.asarray(rng.randn(h, w).astype(np.float32))
    got = sharded_wavedec2(x, wavelet, level, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    want = wavedec2(x, wavelet, level)
    _tree_allclose(got, want, atol=1e-4)
    rec = sharded_waverec2(got, wavelet, mesh=mesh,
                           space_axis="rows", col_axis="cols")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               atol=1e-3, rtol=0)


def test_collective_counts_pinned():
    """The halo-exchange collective SCHEDULE is a design claim (round
    2: one signal-row exchange per forward level — 2 ppermutes — not
    one per pass; stacked channel pairs on the inverse — 4); pin it so
    a regression doubling the ICI traffic fails loudly, and record the
    bytes so scaling artifacts can report traffic per level."""
    from libdwt_tpu.parallel.comm_stats import collective_stats

    mesh = make_mesh_2d(2, 4)
    x = jnp.zeros((512, 512), jnp.float32)
    for level in (1, 2, 3):
        st = collective_stats(
            lambda a: sharded_wavedec2(a, "cdf97", level, mesh=mesh), x)
        assert set(st) == {"ppermute"}, st
        assert st["ppermute"]["count"] == 2 * level, st
    coeffs = sharded_wavedec2(x, "cdf97", 2, mesh=mesh)
    st = collective_stats(
        lambda cs: sharded_waverec2(cs, "cdf97", mesh=mesh), coeffs)
    assert st["ppermute"]["count"] == 4 * 2, st
    # 2-D block sharding: two-phase exchange = 4 ppermutes per forward
    # level (rows + cols), corner samples riding the second phase
    bmesh = make_mesh_blocks(1, 2, 4)
    for level in (1, 2):
        st = collective_stats(
            lambda a: sharded_wavedec2(a, "cdf97", level, mesh=bmesh,
                                       space_axis="rows",
                                       col_axis="cols"), x)
        assert st["ppermute"]["count"] == 4 * level, st
    # 3-D z sharding: one z exchange per forward level
    from libdwt_tpu.parallel import sharded_wavedec3

    v = jnp.zeros((64, 64, 64), jnp.float32)
    zmesh = make_mesh_2d(1, 4)
    st = collective_stats(
        lambda a: sharded_wavedec3(a, "cdf97", 2, mesh=zmesh), v)
    assert st["ppermute"]["count"] == 2 * 2, st


class TestRdmaHalo:
    """Kernel-level make_async_remote_copy halo exchange
    (parallel/remote_halo.py) under the Pallas TPU interpret mode."""

    def test_matches_ppermute_exchange(self):
        from jax.sharding import PartitionSpec as P

        from libdwt_tpu.parallel.remote_halo import rdma_extend_rows
        from libdwt_tpu.parallel.sharded import _exchange_rows_fwd

        mesh = make_mesh_2d(1, 8)
        x = jnp.asarray(np.random.RandomState(0).rand(256, 128)
                        .astype(np.float32))
        spec = P("space", None)
        got = jax.shard_map(
            lambda xl: rdma_extend_rows(
                xl, "space", mesh_axes=("data", "space"), halo=4,
                interpret=True),
            mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
        )(x)
        want = jax.shard_map(
            lambda xl: _exchange_rows_fwd(xl, "space"),
            mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
        )(x)
        assert got.shape == want.shape
        assert float(jnp.abs(got - want).max()) == 0.0

    def test_sharded_wavedec2_rdma_matches_oracle(self):
        mesh = make_mesh_2d(1, 8)
        x = jnp.asarray(np.random.RandomState(1).rand(512, 256)
                        .astype(np.float32))
        got = sharded_wavedec2(x, "cdf97", 3, mesh=mesh,
                               halo_impl="rdma", interpret=True)
        want = wavedec2(x, "cdf97", 3)
        _tree_allclose(got, want, atol=1e-5)

    def test_rdma_rejects_unsupported_layouts(self):
        mesh = make_mesh_2d(2, 4)
        xb = jnp.zeros((2, 256, 128), jnp.float32)
        with pytest.raises(ValueError, match="rdma"):
            sharded_wavedec2(xb, "cdf97", 1, mesh=mesh,
                             halo_impl="rdma", interpret=True)
        with pytest.raises(ValueError, match="halo_impl"):
            sharded_wavedec2(xb[0], "cdf97", 1, mesh=mesh,
                             halo_impl="nope")


class TestShardedKernelBodies:
    """kernel='streamed' (the manual-DMA perf path) and batched inputs
    under shard_map — VERDICT r3 'missing #3'."""

    def test_streamed_kernel_matches_oracle(self):
        mesh = make_mesh_2d(1, 4)
        x = jnp.asarray(np.random.RandomState(0).rand(1024, 256)
                        .astype(np.float32))
        got = sharded_wavedec2(x, "cdf97", 2, mesh=mesh, kernel="streamed",
                               interpret=True)
        _tree_allclose(got, wavedec2(x, "cdf97", 2), atol=1e-5)
        rec = sharded_waverec2(got, "cdf97", mesh=mesh, kernel="streamed",
                               interpret=True)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                                   atol=1e-4, rtol=0)

    @pytest.mark.parametrize("kern", ["fused", "streamed"])
    def test_batched_kernel_matches_oracle(self, kern):
        mesh = make_mesh_2d(2, 4)
        xb = jnp.asarray(np.random.RandomState(1).rand(4, 1024, 256)
                         .astype(np.float32))
        got = sharded_wavedec2(xb, "cdf97", 2, mesh=mesh, kernel=kern,
                               interpret=True)
        _tree_allclose(got, wavedec2(xb, "cdf97", 2), atol=1e-5)
        rec = sharded_waverec2(got, "cdf97", mesh=mesh, kernel=kern,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(xb),
                                   atol=1e-4, rtol=0)

    def test_batched_exchange_is_amortized(self):
        """The halo exchange must run once per LEVEL, not once per
        frame: a batched shard exchanges the whole stacked block."""
        from libdwt_tpu.parallel.comm_stats import collective_stats

        mesh = make_mesh_2d(2, 4)
        xb = jnp.zeros((4, 1024, 256), jnp.float32)
        st = collective_stats(
            lambda a: sharded_wavedec2(a, "cdf97", 2, mesh=mesh,
                                       kernel="streamed", interpret=True),
            xb)
        assert st["ppermute"]["count"] == 2 * 2, st

    def test_small_levels_fall_back_to_fused(self):
        # 512/4 shards = 128 local rows; level 3 leaves 32-row blocks —
        # below the strip pipeline's range, must still match the oracle
        mesh = make_mesh_2d(1, 4)
        x = jnp.asarray(np.random.RandomState(2).rand(512, 256)
                        .astype(np.float32))
        got = sharded_wavedec2(x, "cdf97", 2, mesh=mesh, kernel="streamed",
                               interpret=True)
        _tree_allclose(got, wavedec2(x, "cdf97", 2), atol=1e-5)

    def test_kernel_arg_validated(self):
        mesh = make_mesh_2d(1, 4)
        x = jnp.zeros((512, 256), jnp.float32)
        with pytest.raises(ValueError, match="kernel"):
            sharded_wavedec2(x, "cdf97", 1, mesh=mesh, kernel="mxu")

    def test_rdma_inverse_roundtrip(self):
        """The channel-domain RDMA exchange (rdma_extend_channels, the
        's'/'d' edge-mirror rules) must be bit-identical to the
        ppermute inverse and round-trip the frame."""
        mesh = make_mesh_2d(1, 8)
        x = jnp.asarray(np.random.RandomState(3).rand(512, 256)
                        .astype(np.float32))
        c = sharded_wavedec2(x, "cdf97", 3, mesh=mesh, halo_impl="rdma",
                             interpret=True)
        rec = sharded_waverec2(c, "cdf97", mesh=mesh, halo_impl="rdma",
                               interpret=True)
        rec_pp = sharded_waverec2(c, "cdf97", mesh=mesh)
        assert float(jnp.abs(rec - rec_pp).max()) == 0.0
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                                   atol=1e-4, rtol=0)
