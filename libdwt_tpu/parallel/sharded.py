"""Multi-chip sharded DWT: spatial (row) sharding with halo exchange.

The reference is single-process; its only "distributed" transport is DMA
to FPGA memory banks (/root/reference/src/libdwt.c:9449-9486) and its
block decomposition chains lifting state across BANK_SIZE-limited blocks
(/root/reference/src/libdwt.c:10577-10603).  The TPU-native equivalent is
first-class here: frames (and batches of frames) are sharded over a
``jax.sharding.Mesh`` and the column-pass lifting dependency across the
shard boundary is resolved by exchanging a fixed halo of boundary rows
with ``jax.lax.ppermute`` over ICI (within a slice) / DCN (across hosts).

Key invariant (why a 4-row halo suffices): one CDF 9/7 lifting pass
corrupts at most 2 low + 2 high samples at each end of an extended block
(one channel sample per lifting step); keeping only the interior of a
block extended by HALO=4 signal rows therefore reproduces the unsharded
result exactly — the same overlap-vs-carried-state trade the reference's
single-loop cores make per tile (/root/reference/src/dwt-sym.c:434-534).

Axes convention: images are (..., H, W); the sharded ("space") axis is
rows (-2).  Batch axes shard trivially over the "data" mesh axis.
Passing ``col_axis`` shards W as well (2-D block sharding over a
('data', rows, cols) mesh — the shard_map analogue of the reference's
BLOCKS traversal order, /root/reference/src/dwt-core.h:76-99): halo
exchange then runs in two phases — rows first, then columns of the
row-extended block — so corner samples from diagonal neighbours arrive
without any dedicated diagonal collective.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from libdwt_tpu.models.wavelets import get_wavelet
from libdwt_tpu.ops.lifting import lift_fwd, lift_inv

__all__ = [
    "HALO",
    "sharded_wavedec2",
    "sharded_waverec2",
    "sharded_dwt2_level",
    "sharded_idwt2_level",
    "sharded_wavedec3",
    "sharded_waverec3",
    "make_mesh_2d",
    "make_mesh_blocks",
]

#: signal-domain halo rows exchanged per level (enough for CDF 9/7's
#: 4 lifting steps; also correct for shorter wavelets).
HALO = 4
#: channel-domain halo (low/high rows) for the inverse pass.
CH = 2


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """A ('data', 'space') mesh: batch-parallel x spatial row sharding."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if len(devices) < n_data * n_space:
        raise ValueError(
            f"make_mesh_2d({n_data}, {n_space}) needs {n_data * n_space} "
            f"devices, have {len(devices)}"
        )
    devices = devices[: n_data * n_space]
    import numpy as np

    return Mesh(
        np.array(devices).reshape(n_data, n_space), axis_names=("data", "space")
    )


def make_mesh_blocks(n_data: int, n_rows: int, n_cols: int, devices=None) -> Mesh:
    """A ('data', 'rows', 'cols') mesh: batch parallelism x 2-D spatial
    block sharding — the shard_map analogue of the reference's BLOCKS
    traversal order (/root/reference/src/dwt-core.h:76-99) for frames
    too large (or too square) to scale by row sharding alone."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    need = n_data * n_rows * n_cols
    if len(devices) < need:
        raise ValueError(
            f"make_mesh_blocks({n_data}, {n_rows}, {n_cols}) needs {need} "
            f"devices, have {len(devices)}"
        )
    import numpy as np

    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_rows, n_cols),
        axis_names=("data", "rows", "cols"),
    )


def _check_mirror_safe(wavelet):
    """The edge shards fill their halo with the PHYSICAL whole-point
    mirror; that reproduces lift_fwd/lift_inv's per-step neighbour
    clamping only when every lifting step is symmetric (left weight ==
    right weight) or the clamped neighbour carries zero weight (haar's
    one-sided steps).  d4's asymmetric steps break the equivalence, so
    reject rather than silently differ from the unsharded oracle at the
    global borders."""
    from libdwt_tpu.ops.fused import fused_supported

    if not (fused_supported(wavelet) or wavelet.name == "haar"):
        raise ValueError(
            f"sharded transforms need symmetric lifting steps (or haar); "
            f"'{wavelet.name}' would differ from the unsharded result at "
            f"the global borders"
        )


# ------------------------------------------------------------- halo helpers


def _exchange_fwd(x: jax.Array, axis_name: str, axis: int = -2,
                  halo: int = HALO) -> jax.Array:
    """Extend a local block by ``halo`` signal samples on each side of
    ``axis``.

    Interior shards receive neighbours' boundary samples over the mesh
    interconnect; edge shards fill the halo with the whole-point mirror
    of their own samples (x[-m] := x[m]), reproducing the reference's
    symmetric border extension (/root/reference/src/dwt-sym.c:434-450).
    ``halo`` defaults to the analysis support radius (HALO=4); the
    streamed per-shard kernels exchange a full 8-row halo so their DMA
    windows stay sublane-aligned (see ops.streamed, ADVICE r04).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down_perm = [(i, i + 1) for i in range(n_dev - 1)]  # my block -> next shard
    up_perm = [(i + 1, i) for i in range(n_dev - 1)]  # my block -> prev shard
    L = x.shape[axis]

    def take(s, e):
        return jax.lax.slice_in_dim(x, s, e, axis=axis)

    from_above = jax.lax.ppermute(take(L - halo, L), axis_name, down_perm)
    from_below = jax.lax.ppermute(take(0, halo), axis_name, up_perm)
    top_mirror = jnp.flip(take(1, halo + 1), axis=axis)
    bot_mirror = jnp.flip(take(L - halo - 1, L - 1), axis=axis)
    top = jnp.where(idx == 0, top_mirror, from_above)
    bot = jnp.where(idx == n_dev - 1, bot_mirror, from_below)
    return jnp.concatenate([top, x, bot], axis=axis)


def _exchange_rows_fwd(x: jax.Array, axis_name: str,
                       halo: int = HALO) -> jax.Array:
    """Row-axis (-2) specialization of :func:`_exchange_fwd`."""
    return _exchange_fwd(x, axis_name, axis=-2, halo=halo)


def _exchange_channels_inv(
    s: jax.Array, d: jax.Array, axis_name: str, ch: int = CH, axis: int = -2
) -> Tuple[jax.Array, jax.Array]:
    """Extend local low/high channel blocks by ``ch`` samples each side
    of ``axis``.

    Channel-domain whole-point mirror (derived from x[-k] = x[k] with
    s[i] = x[2i], d[i] = x[2i+1], global level length even):
      top:    s[-m] = s[m]        d[-m] = d[m-1]
      bottom: s[N+m] = s[N-1-m]   d[N-1+m] = d[N-1-m]
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down_perm = [(i, i + 1) for i in range(n_dev - 1)]
    up_perm = [(i + 1, i) for i in range(n_dev - 1)]

    def ext(c, top_mirror, bot_mirror):
        L = c.shape[axis]
        lo = jax.lax.slice_in_dim(c, 0, ch, axis=axis)
        hi = jax.lax.slice_in_dim(c, L - ch, L, axis=axis)
        from_above = jax.lax.ppermute(hi, axis_name, down_perm)
        from_below = jax.lax.ppermute(lo, axis_name, up_perm)
        top = jnp.where(idx == 0, top_mirror, from_above)
        bot = jnp.where(idx == n_dev - 1, bot_mirror, from_below)
        return jnp.concatenate([top, c, bot], axis=axis)

    def rev(c, a, b):
        return jnp.flip(jax.lax.slice_in_dim(c, a, b, axis=axis), axis=axis)

    Ls, Ld = s.shape[axis], d.shape[axis]
    s_ext = ext(s, rev(s, 1, ch + 1), rev(s, Ls - ch, Ls))
    d_ext = ext(d, rev(d, 0, ch), rev(d, Ld - ch - 1, Ld - 1))
    return s_ext, d_ext


def _col_inv(lo: jax.Array, hi: jax.Array, wavelet, axis_name: str):
    """Inverse column-pass lifting on row-sharded channel blocks."""
    lo_ext, hi_ext = _exchange_channels_inv(lo, hi, axis_name)
    x = lift_inv(lo_ext, hi_ext, wavelet, axis=-2)
    keep = 2 * lo.shape[-2]
    return x[..., 2 * CH : 2 * CH + keep, :]


# ------------------------------------------------------- local level kernels


def _level_fwd_local(ll, wavelet, axis_name, ext=None):
    # ONE signal-row halo exchange per level (2 ppermutes, not 4): the
    # row pass is rowwise, so the halo rows' row transforms are computed
    # locally and feed the column pass directly.  ``ext`` lets a caller
    # substitute its own HALO-extended block (the RDMA exchange of
    # parallel/remote_halo.py).
    if ext is None:
        ext = _exchange_rows_fwd(ll, axis_name)
    l, h = lift_fwd(ext, wavelet, axis=-1)
    off, keep = HALO // 2, ll.shape[-2] // 2

    def col(a):
        lo, hi = lift_fwd(a, wavelet, axis=-2)
        return (lo[..., off : off + keep, :], hi[..., off : off + keep, :])

    ll2, lh = col(l)
    hl, hh = col(h)
    return ll2, hl, lh, hh


def _level_fwd_local_blocks(ll, wavelet, row_axis, col_axis):
    """One forward level on a 2-D-block shard: two-phase halo exchange
    (rows first, then columns OF THE ROW-EXTENDED block, so corner
    samples from diagonal neighbours ride the second phase), then the
    same crop-to-interior lifting as the row-sharded path on both axes.
    """
    ext = _exchange_fwd(ll, row_axis, axis=-2)
    ext = _exchange_fwd(ext, col_axis, axis=-1)
    off = HALO // 2
    keep_x = ll.shape[-1] // 2
    l, h = lift_fwd(ext, wavelet, axis=-1)
    l = l[..., off : off + keep_x]
    h = h[..., off : off + keep_x]
    keep_y = ll.shape[-2] // 2

    def col(a):
        lo, hi = lift_fwd(a, wavelet, axis=-2)
        return (lo[..., off : off + keep_y, :], hi[..., off : off + keep_y, :])

    ll2, lh = col(l)
    hl, hh = col(h)
    return ll2, hl, lh, hh


def _level_inv_local_blocks(ll, hl, lh, hh, wavelet, row_axis, col_axis):
    """One inverse level on a 2-D-block shard: channel-halo exchange
    along columns first (x-low bands ll/lh vs x-high hl/hh, stacked
    along rows so it is ONE collective pair), then along rows on the
    column-extended arrays (corners ride the second phase), then the
    usual inverse column+row lifting cropped to the interior."""
    hy = ll.shape[-2]
    lo_x = jnp.concatenate([ll, lh], axis=-2)
    hi_x = jnp.concatenate([hl, hh], axis=-2)
    lo_x, hi_x = _exchange_channels_inv(lo_x, hi_x, col_axis, axis=-1)
    ll, lh = lo_x[..., :hy, :], lo_x[..., hy:, :]
    hl, hh = hi_x[..., :hy, :], hi_x[..., hy:, :]
    w = ll.shape[-1]  # local x channels + 2*CH halo
    s = jnp.concatenate([ll, hl], axis=-1)
    d = jnp.concatenate([lh, hh], axis=-1)
    s_ext, d_ext = _exchange_channels_inv(s, d, row_axis, axis=-2)
    x = lift_inv(s_ext, d_ext, wavelet, axis=-2)
    x = x[..., 2 * CH : 2 * CH + 2 * hy, :]
    out = lift_inv(x[..., :w], x[..., w:], wavelet, axis=-1)
    keep_x = 2 * (w - 2 * CH)
    return out[..., 2 * CH : 2 * CH + keep_x]


def _level_fwd_local_fused(ll, wavelet, axis_name, interpret):
    """Fused-kernel variant: exchange the 4-row halo once (batched
    arrays exchange ONCE for the whole batch), then run the
    single-loop Pallas strip kernel on each extended local block
    (boundary_rows='extended'), keeping row+column lifting in one VMEM
    residency per shard."""
    from libdwt_tpu.ops.fused import fused_dwt2_level

    ext = _exchange_rows_fwd(ll, axis_name)

    def run(e):
        return fused_dwt2_level(
            e, wavelet, interpret=interpret, boundary_rows="extended"
        )

    return run(ext) if ll.ndim == 2 else _map_leading(run, ext)


def _streamed_block_ok(h: int, w: int, wavelet) -> bool:
    """Local-block geometry gate for the per-shard streamed kernels
    (they need >= 2 strips); smaller blocks fall back to the fused
    grid kernel, which handles any even block with > 5 rows."""
    from libdwt_tpu.ops.streamed import streamed_supported

    return streamed_supported((h, w), wavelet, 256, levels=1)


def _level_fwd_local_streamed(ll, wavelet, axis_name, interpret):
    """Streamed-kernel variant (the manual double-buffered DMA perf
    path of ops/streamed.py) running inside the shard: same exchange as
    the fused variant, then the streamed strip kernel per extended
    block.  Levels whose local block is too small for the strip
    pipeline run the fused grid kernel instead."""
    from libdwt_tpu.ops.streamed import TOP, streamed_dwt2_level

    if not _streamed_block_ok(ll.shape[-2], ll.shape[-1], wavelet):
        return _level_fwd_local_fused(ll, wavelet, axis_name, interpret)
    # TOP (8) deep, not HALO: the strip DMA windows of the extended
    # kernel must stay 8-aligned on the sublane axis (ADVICE r04)
    ext = _exchange_rows_fwd(ll, axis_name, halo=TOP)

    def run(e):
        return streamed_dwt2_level(
            e, wavelet, interpret=interpret, boundary_rows="extended"
        )

    return run(ext) if ll.ndim == 2 else _map_leading(run, ext)


def _level_inv_local_streamed(ll, hl, lh, hh, wavelet, axis_name, interpret):
    """Streamed-kernel inverse variant: one stacked channel-halo
    exchange (TOP=8 deep so the extended kernel's DMA windows stay
    8-aligned, ADVICE r04; once for the whole batch), then the streamed
    inverse strip kernel per extended band set.  Levels whose local
    block is too small for the strip pipeline run the fused grid
    kernel instead (geometry checked BEFORE the exchange so no orphan
    collectives are traced)."""
    from libdwt_tpu.ops.streamed import TOP, streamed_idwt2_level

    if not _streamed_block_ok(2 * ll.shape[-2], 2 * ll.shape[-1], wavelet):
        return _level_inv_local_fused(ll, hl, lh, hh, wavelet, axis_name,
                                      interpret)
    w = ll.shape[-1]
    s = jnp.concatenate([ll, hl], axis=-1)
    d = jnp.concatenate([lh, hh], axis=-1)
    s_ext, d_ext = _exchange_channels_inv(s, d, axis_name, ch=TOP)

    def run(se, de):
        return streamed_idwt2_level(
            se[..., :w], se[..., w:], de[..., :w], de[..., w:],
            wavelet=wavelet, interpret=interpret, boundary_rows="extended",
        )

    return (run(s_ext, d_ext) if ll.ndim == 2
            else _map_leading(run, s_ext, d_ext))


def _map_leading(fn, *arrays):
    """Trace-time batch loop for Pallas per-shard kernels: vmap would
    fold the batch into the kernel grid and multiply the VMEM working
    set (observed OOM on batched 4K frames, api.dwt2); sequential
    launches are VMEM-safe.  Maps ``fn`` over the leading axes of
    equally-batched ``arrays``; fn returns an array or a tuple."""
    batch = arrays[0].shape[:-2]
    flat = [a.reshape((-1,) + a.shape[-2:]) for a in arrays]
    per = [fn(*(f[i] for f in flat)) for i in range(flat[0].shape[0])]
    if isinstance(per[0], tuple):
        return tuple(
            jnp.stack([p[k] for p in per]).reshape(
                batch + per[0][k].shape)
            for k in range(len(per[0]))
        )
    out = jnp.stack(per)
    return out.reshape(batch + out.shape[-2:])


def _level_inv_local(ll, hl, lh, hh, wavelet, axis_name, exchange=None):
    # stack the two band pairs along the (local) width so the channel
    # halo exchange is ONE collective pair instead of two.
    # ``exchange`` substitutes an alternative halo transport (the RDMA
    # kernel of parallel/remote_halo.py).
    w = ll.shape[-1]
    s = jnp.concatenate([ll, hl], axis=-1)
    d = jnp.concatenate([lh, hh], axis=-1)
    if exchange is None:
        s_ext, d_ext = _exchange_channels_inv(s, d, axis_name)
    else:
        s_ext, d_ext = exchange(s, d)
    x = lift_inv(s_ext, d_ext, wavelet, axis=-2)
    keep = 2 * ll.shape[-2]
    x = x[..., 2 * CH : 2 * CH + keep, :]
    return lift_inv(x[..., :w], x[..., w:], wavelet, axis=-1)


def _level_inv_local_fused(ll, hl, lh, hh, wavelet, axis_name, interpret):
    """Fused-kernel inverse variant: exchange a 4-row channel halo per
    band pair once (once for the whole batch), then run the
    single-loop Pallas inverse strip kernel on the extended local
    blocks (boundary_rows='extended'), keeping both inverse passes in
    one VMEM residency per shard."""
    from libdwt_tpu.ops.fused import CH as FCH, fused_idwt2_level

    w = ll.shape[-1]
    s = jnp.concatenate([ll, hl], axis=-1)
    d = jnp.concatenate([lh, hh], axis=-1)
    s_ext, d_ext = _exchange_channels_inv(s, d, axis_name, ch=FCH)

    def run(se, de):
        return fused_idwt2_level(
            se[..., :w], se[..., w:], de[..., :w], de[..., w:],
            wavelet, interpret=interpret, boundary_rows="extended",
        )

    return (run(s_ext, d_ext) if ll.ndim == 2
            else _map_leading(run, s_ext, d_ext))


# ------------------------------------------------------------- public entry


def _resolve_kernel(kernel: Optional[str], use_fused: bool) -> Optional[str]:
    """Back-compat: ``use_fused=True`` is ``kernel='fused'``."""
    if kernel is None and use_fused:
        kernel = "fused"
    if kernel not in (None, "fused", "streamed"):
        raise ValueError("kernel must be None, 'fused' or 'streamed'")
    return kernel


def _check_sharded_sizes(h: int, n_space: int, level: int,
                         use_fused: bool = False):
    if h % (n_space * (1 << level)) != 0:
        raise ValueError(
            f"sharded transform needs the sharded extent ({h}) divisible "
            f"by n_shards*2^level ({n_space}*{1 << level})"
        )
    # the fused inverse's channel mirror slices FCH+1 = 5 local rows
    # (ops/fused.CH = 4); the jnp path needs HALO = 4
    min_rows = 5 if use_fused else HALO
    if h // (n_space * (1 << level)) < min_rows:
        raise ValueError(
            f"local rows at the deepest level "
            f"({h // (n_space * (1 << level))}) must be >= {min_rows}; "
            f"reduce level or n_space"
        )


def sharded_wavedec2(
    x: jax.Array,
    wavelet="cdf97",
    level: int = 1,
    *,
    mesh: Mesh,
    space_axis: str = "space",
    data_axis: Optional[str] = "data",
    col_axis: Optional[str] = None,
    use_fused: bool = False,
    kernel: Optional[str] = None,
    halo_impl: str = "ppermute",
    interpret: bool = False,
):
    """Multi-level 2-D MRA sharded over mesh rows (and batch over data).

    Input (..., H, W) with leading batch axes sharded over ``data_axis``
    and H sharded over ``space_axis``.  Returns the same pytree structure
    as :func:`libdwt_tpu.wavedec2` — [LL_J, (HL_J, LH_J, HH_J), ...] —
    with every array sharded identically to the input.

    ``col_axis`` additionally shards W over that mesh axis (2-D block
    sharding over a ('data', rows, cols) mesh — see
    :func:`make_mesh_blocks`); halo exchange then runs in two phases so
    corner samples from diagonal neighbours arrive without a dedicated
    diagonal collective.

    ``kernel='fused'`` (alias ``use_fused=True``) runs the per-shard
    work through the single-loop Pallas strip kernel (one VMEM
    residency per level per shard) after the halo exchange;
    ``kernel='streamed'`` runs the manual double-buffered DMA strip
    kernel (ops/streamed.py — the perf path) the same way.  Both need
    2-D local blocks with even row counts (row sharding only — the
    strip kernels' lane borders assume true signal edges); batched
    inputs launch one kernel per frame inside the shard.

    ``halo_impl='rdma'`` exchanges the halo with a kernel-level
    ``make_async_remote_copy`` push into the neighbour's buffer
    (parallel/remote_halo.py) instead of ``ppermute`` — 2-D inputs,
    row sharding only.
    """
    wavelet = get_wavelet(wavelet)
    _check_mirror_safe(wavelet)
    kernel = _resolve_kernel(kernel, use_fused)
    n_space = mesh.shape[space_axis]
    if halo_impl not in ("ppermute", "rdma"):
        raise ValueError("halo_impl must be 'ppermute' or 'rdma'")
    if halo_impl == "rdma" and (col_axis is not None or x.ndim != 2
                                or kernel is not None):
        raise ValueError(
            "halo_impl='rdma' supports unbatched 2-D row sharding on "
            "the jnp lifting path (no col_axis/kernel)"
        )
    _check_sharded_sizes(x.shape[-2], n_space, level, kernel is not None)
    if col_axis is not None:
        if kernel is not None:
            raise ValueError(
                "kernel= supports row sharding only (the strip "
                "kernels' lane borders assume true signal edges); "
                "drop col_axis or kernel"
            )
        _check_sharded_sizes(x.shape[-1], mesh.shape[col_axis], level)

    nbatch = x.ndim - 2
    batch_spec = (data_axis,) + (None,) * (nbatch - 1) if nbatch else ()
    spec = P(*batch_spec, space_axis, col_axis)
    level_fwd_kernel = (_level_fwd_local_fused if kernel == "fused"
                        else _level_fwd_local_streamed)

    def local_fn(xl):
        coeffs = []
        ll = xl
        for _ in range(level):
            if col_axis is not None:
                ll, hl, lh, hh = _level_fwd_local_blocks(
                    ll, wavelet, space_axis, col_axis
                )
            elif kernel is not None:
                ll, hl, lh, hh = level_fwd_kernel(
                    ll, wavelet, space_axis, interpret
                )
            elif halo_impl == "rdma":
                from libdwt_tpu.parallel.remote_halo import rdma_extend_rows

                ext = rdma_extend_rows(
                    ll, space_axis, mesh_axes=mesh.axis_names,
                    halo=HALO, interpret=interpret,
                )
                ll, hl, lh, hh = _level_fwd_local(
                    ll, wavelet, space_axis, ext=ext
                )
            else:
                ll, hl, lh, hh = _level_fwd_local(ll, wavelet, space_axis)
            coeffs.append((hl, lh, hh))
        return [ll] + coeffs[::-1]

    out_specs = [spec] + [(spec, spec, spec)] * level
    # check_vma must be off when Pallas calls run inside the shard
    # (their ShapeDtypeStruct outputs carry no varying-mesh-axes info).
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=spec, out_specs=out_specs,
        check_vma=not (kernel is not None or halo_impl == "rdma"),
    )(x)


def sharded_waverec2(
    coeffs,
    wavelet="cdf97",
    *,
    mesh: Mesh,
    space_axis: str = "space",
    data_axis: Optional[str] = "data",
    col_axis: Optional[str] = None,
    use_fused: bool = False,
    kernel: Optional[str] = None,
    halo_impl: str = "ppermute",
    interpret: bool = False,
):
    """Inverse of :func:`sharded_wavedec2` (same sharding convention).

    ``halo_impl='rdma'`` exchanges the channel halos with the
    kernel-level ``make_async_remote_copy`` push
    (parallel/remote_halo.py) — 2-D pyramids, row sharding, jnp
    lifting path only, like the forward.

    ``kernel='fused'`` (alias ``use_fused=True``) runs the per-shard
    inverse through the single-loop Pallas strip kernel after a
    channel-halo exchange; ``kernel='streamed'`` the manual-DMA strip
    kernel.  Both need 2-D local blocks with even channel row counts
    (row sharding only, like the forward); batched pyramids launch one
    kernel per frame inside the shard.
    """
    wavelet = get_wavelet(wavelet)
    _check_mirror_safe(wavelet)
    kernel = _resolve_kernel(kernel, use_fused)
    level = len(coeffs) - 1
    ll = coeffs[0]
    if halo_impl not in ("ppermute", "rdma"):
        raise ValueError("halo_impl must be 'ppermute' or 'rdma'")
    if halo_impl == "rdma" and (col_axis is not None or ll.ndim != 2
                                or kernel is not None):
        raise ValueError(
            "halo_impl='rdma' supports unbatched 2-D row sharding on "
            "the jnp lifting path (no col_axis/kernel)"
        )
    if col_axis is not None and kernel is not None:
        raise ValueError(
            "kernel= supports row sharding only (the strip kernels' "
            "lane borders assume true signal edges); drop col_axis or "
            "kernel"
        )
    _check_sharded_sizes(ll.shape[-2] << level, mesh.shape[space_axis],
                         level, kernel is not None)
    if col_axis is not None:
        _check_sharded_sizes(ll.shape[-1] << level, mesh.shape[col_axis],
                             level)
    ch = ll.shape[-2]
    for lvl, (hl, lh, hh) in enumerate(coeffs[1:]):
        if not (hl.shape == lh.shape == hh.shape
                and hl.shape[-2] == ch):
            raise ValueError(
                f"band shapes at level {level - lvl} do not chain: "
                f"LL rows {ch} vs {hl.shape}/{lh.shape}/{hh.shape}"
            )
        ch *= 2
    nbatch = ll.ndim - 2
    batch_spec = (data_axis,) + (None,) * (nbatch - 1) if nbatch else ()
    spec = P(*batch_spec, space_axis, col_axis)
    in_specs = [spec] + [(spec, spec, spec)] * level
    level_inv_kernel = (_level_inv_local_fused if kernel == "fused"
                        else _level_inv_local_streamed)

    def local_fn(cs):
        ll = cs[0]
        for hl, lh, hh in cs[1:]:
            if col_axis is not None:
                ll = _level_inv_local_blocks(
                    ll, hl, lh, hh, wavelet, space_axis, col_axis
                )
            elif kernel is not None:
                ll = level_inv_kernel(
                    ll, hl, lh, hh, wavelet, space_axis, interpret
                )
            elif halo_impl == "rdma":
                from libdwt_tpu.parallel.remote_halo import (
                    rdma_extend_channels,
                )

                ll = _level_inv_local(
                    ll, hl, lh, hh, wavelet, space_axis,
                    exchange=lambda s, d: rdma_extend_channels(
                        s, d, space_axis, mesh_axes=mesh.axis_names,
                        ch=CH, interpret=interpret),
                )
            else:
                ll = _level_inv_local(ll, hl, lh, hh, wavelet, space_axis)
        return ll

    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(in_specs,), out_specs=spec,
        check_vma=not (kernel is not None or halo_impl == "rdma"),
    )(coeffs)


def _level3_fwd_local_blocks(low, wavelet, z_axis, y_axis):
    """One forward 3-D level on a (z, y)-block shard: two-phase halo
    exchange (z first, then y of the z-extended block, so corners from
    diagonal neighbours ride the second phase), local x lifting, then
    y and z lifting each cropped to the shard interior."""
    keep_y = low.shape[-2] // 2
    keep_z = low.shape[-3] // 2
    off = HALO // 2
    ext = _exchange_fwd(low, z_axis, axis=-3)
    ext = _exchange_fwd(ext, y_axis, axis=-2)
    bands = {"": ext}
    new = {}
    for name, arr in bands.items():  # x pass: local
        lo, hi = lift_fwd(arr, wavelet, axis=-1)
        new["L" + name] = lo
        new["H" + name] = hi
    bands = new
    new = {}
    for name, arr in bands.items():  # y pass: crop to interior channels
        lo, hi = lift_fwd(arr, wavelet, axis=-2)
        new["L" + name] = lo[..., off : off + keep_y, :]
        new["H" + name] = hi[..., off : off + keep_y, :]
    bands = new
    new = {}
    for name, arr in bands.items():  # z pass: crop to interior channels
        lo, hi = lift_fwd(arr, wavelet, axis=-3)
        new["L" + name] = lo[..., off : off + keep_z, :, :]
        new["H" + name] = hi[..., off : off + keep_z, :, :]
    return new


def _level3_inv_local_blocks(full, wavelet, z_axis, y_axis):
    """One inverse 3-D level on a (z, y)-block shard.

    Band names are (z, y, x) role triples.  The y channel halos are
    exchanged FIRST, on the raw bands (the y channel structure is
    separable, so extending y channels commutes with the z inverse);
    the z exchange then runs on the y-extended arrays so diagonal
    corners arrive without a dedicated collective.  Each axis costs one
    stacked collective pair.
    """
    # ---- y channel exchange (pair by the y role, stacked along x)
    names_y = sorted({n[0] + n[2] for n in full})  # (z, x) suffixes
    wloc = next(iter(full.values())).shape[-1]
    s_y = jnp.concatenate(
        [full[zx[0] + "L" + zx[1]] for zx in names_y], axis=-1
    )
    d_y = jnp.concatenate(
        [full[zx[0] + "H" + zx[1]] for zx in names_y], axis=-1
    )
    s_y, d_y = _exchange_channels_inv(s_y, d_y, y_axis, axis=-2)
    for k, zx in enumerate(names_y):
        full[zx[0] + "L" + zx[1]] = s_y[..., k * wloc : (k + 1) * wloc]
        full[zx[0] + "H" + zx[1]] = d_y[..., k * wloc : (k + 1) * wloc]

    # ---- z channel exchange + inverse z lifting (pair by the z role)
    names_z = sorted({n[1:] for n in full})  # (y, x) suffixes
    s_z = jnp.concatenate([full["L" + n] for n in names_z], axis=-1)
    d_z = jnp.concatenate([full["H" + n] for n in names_z], axis=-1)
    # keep = 2x the PRE-extension z channels: the z halo exists only
    # inside the exchanged copies (the y halo, by contrast, persists on
    # the band arrays from the stage above)
    keep_z = 2 * full["L" + names_z[0]].shape[-3]
    s_z, d_z = _exchange_channels_inv(s_z, d_z, z_axis, axis=-3)
    rec = lift_inv(s_z, d_z, wavelet, axis=-3)
    rec = rec[..., 2 * CH : 2 * CH + keep_z, :, :]
    full = {
        n: rec[..., k * wloc : (k + 1) * wloc]
        for k, n in enumerate(names_z)
    }

    # ---- inverse y lifting on the halo-extended channels (pair by y)
    names_x = sorted({n[1:] for n in full})  # x suffixes
    s = jnp.concatenate([full["L" + n] for n in names_x], axis=-1)
    d = jnp.concatenate([full["H" + n] for n in names_x], axis=-1)
    rec = lift_inv(s, d, wavelet, axis=-2)
    keep_y = 2 * (s.shape[-2] - 2 * CH)
    rec = rec[..., 2 * CH : 2 * CH + keep_y, :]
    full = {
        n: rec[..., k * wloc : (k + 1) * wloc]
        for k, n in enumerate(names_x)
    }

    # ---- inverse x lifting: local
    return lift_inv(full["L"], full["H"], wavelet, axis=-1)


def sharded_wavedec3(
    x: jax.Array,
    wavelet="cdf97",
    level: int = 1,
    *,
    mesh: Mesh,
    space_axis: str = "space",
    data_axis: Optional[str] = "data",
    col_axis: Optional[str] = None,
):
    """Multi-level 3-D MRA sharded over the z (depth) axis.

    Input (..., Z, Y, X) with Z sharded over ``space_axis`` and leading
    batch axes over ``data_axis``.  The x/y passes are local; the z-pass
    lifting dependency crosses shard boundaries and is resolved with the
    same 4-sample ppermute halo exchange as the 2-D path — the
    multi-host decomposition absent from the reference's 3-D transforms
    (/root/reference/src/volume-dwt.c).  Returns the wavedec3 pytree:
    [LLL_J, bands_J, ..., bands_1] with 7-band dicts.

    ``col_axis`` additionally shards Y over that mesh axis ((z, y)
    block sharding for volumes whose depth alone cannot feed the mesh);
    halo exchange then runs in two phases per level, z first then y.
    """
    wavelet = get_wavelet(wavelet)
    _check_mirror_safe(wavelet)
    n_space = mesh.shape[space_axis]
    _check_sharded_sizes(x.shape[-3], n_space, level)
    if col_axis is not None:
        _check_sharded_sizes(x.shape[-2], mesh.shape[col_axis], level)

    nbatch = x.ndim - 3
    batch_spec = (data_axis,) + (None,) * (nbatch - 1) if nbatch else ()
    spec = P(*batch_spec, space_axis, col_axis, None)

    if col_axis is not None:

        def local_fn(xl):
            coeffs = []
            low = xl
            for _ in range(level):
                bands = _level3_fwd_local_blocks(
                    low, wavelet, space_axis, col_axis
                )
                low = bands.pop("LLL")
                coeffs.append(bands)
            return [low] + coeffs[::-1]

        band_spec = {k: spec for k in
                     ("LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH")}
        out_specs = [spec] + [band_spec] * level
        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=spec, out_specs=out_specs
        )(x)

    def local_fn(xl):
        coeffs = []
        low = xl
        for _ in range(level):
            # ONE z-halo exchange per level (2 ppermutes, not 2 per
            # band): the x/y passes are per-z-slice, so the halo
            # slices' transforms are computed locally and feed the
            # z pass directly
            keep_z = low.shape[-3] // 2
            ext = jnp.moveaxis(
                _exchange_rows_fwd(jnp.moveaxis(low, -3, -2), space_axis),
                -2, -3,
            )
            bands = {"": ext}
            for axis in (-1, -2):  # x then y: local lifting
                new = {}
                for name, arr in bands.items():
                    lo, hi = lift_fwd(arr, wavelet, axis=axis)
                    new["L" + name] = lo
                    new["H" + name] = hi
                bands = new
            # z pass: local lifting on the extended depth, then crop
            off = HALO // 2
            new = {}
            for name, arr in bands.items():
                lo, hi = lift_fwd(arr, wavelet, axis=-3)
                new["L" + name] = lo[..., off : off + keep_z, :, :]
                new["H" + name] = hi[..., off : off + keep_z, :, :]
            bands = new
            low = bands.pop("LLL")
            coeffs.append(bands)
        return [low] + coeffs[::-1]

    band_spec = {k: spec for k in
                 ("LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH")}
    out_specs = [spec] + [band_spec] * level
    return jax.shard_map(local_fn, mesh=mesh, in_specs=spec, out_specs=out_specs)(x)


def sharded_waverec3(
    coeffs,
    wavelet="cdf97",
    *,
    mesh: Mesh,
    space_axis: str = "space",
    data_axis: Optional[str] = "data",
    col_axis: Optional[str] = None,
):
    """Inverse of :func:`sharded_wavedec3` (same sharding convention;
    ``col_axis`` mirrors the forward's (z, y) block sharding)."""
    wavelet = get_wavelet(wavelet)
    _check_mirror_safe(wavelet)
    level = len(coeffs) - 1
    low = coeffs[0]
    _check_sharded_sizes(low.shape[-3] << level, mesh.shape[space_axis],
                         level)
    if col_axis is not None:
        _check_sharded_sizes(low.shape[-2] << level, mesh.shape[col_axis],
                             level)
    nbatch = low.ndim - 3
    batch_spec = (data_axis,) + (None,) * (nbatch - 1) if nbatch else ()
    spec = P(*batch_spec, space_axis, col_axis, None)
    band_spec = {k: spec for k in
                 ("LLH", "LHL", "LHH", "HLL", "HLH", "HHL", "HHH")}
    in_specs = [spec] + [band_spec] * level

    if col_axis is not None:

        def local_fn(cs):
            low = cs[0]
            for bands in cs[1:]:
                full = dict(bands)
                full["LLL"] = low
                low = _level3_inv_local_blocks(
                    full, wavelet, space_axis, col_axis
                )
            return low

        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=(in_specs,), out_specs=spec
        )(coeffs)

    def local_fn(cs):
        low = cs[0]
        for bands in cs[1:]:
            full = dict(bands)
            full["LLL"] = low
            # inverse z pass: stack ALL band pairs along x so the
            # channel halo exchange is ONE collective pair (not one per
            # band)
            names = sorted({n[1:] for n in full})
            wloc = full["L" + names[0]].shape[-1]
            lo_all = jnp.concatenate(
                [jnp.moveaxis(full["L" + n], -3, -2) for n in names], axis=-1
            )
            hi_all = jnp.concatenate(
                [jnp.moveaxis(full["H" + n], -3, -2) for n in names], axis=-1
            )
            rec = _col_inv(lo_all, hi_all, wavelet, space_axis)
            new = {}
            for k, name in enumerate(names):
                part = rec[..., k * wloc : (k + 1) * wloc]
                new[name] = jnp.moveaxis(part, -2, -3)
            full = new
            # local inverse y then x
            for axis in (-2, -1):
                names = sorted({n[1:] for n in full})
                new = {}
                for name in names:
                    new[name] = lift_inv(
                        full["L" + name], full["H" + name], wavelet, axis=axis
                    )
                full = new
            low = full[""]
        return low

    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(in_specs,), out_specs=spec
    )(coeffs)


def sharded_dwt2_level(x, wavelet="cdf97", *, mesh, space_axis="space",
                       data_axis="data", col_axis=None, use_fused=False,
                       kernel=None, interpret=False):
    """Single-level sharded 2-D transform -> (LL, HL, LH, HH)."""
    c = sharded_wavedec2(
        x, wavelet, 1, mesh=mesh, space_axis=space_axis,
        data_axis=data_axis, col_axis=col_axis, use_fused=use_fused,
        kernel=kernel, interpret=interpret,
    )
    ll, (hl, lh, hh) = c[0], c[1]
    return ll, hl, lh, hh


def sharded_idwt2_level(ll, hl, lh, hh, wavelet="cdf97", *, mesh,
                        space_axis="space", data_axis="data", col_axis=None,
                        use_fused=False, kernel=None, interpret=False):
    """Inverse of :func:`sharded_dwt2_level`."""
    return sharded_waverec2(
        [ll, (hl, lh, hh)],
        wavelet,
        mesh=mesh,
        space_axis=space_axis,
        data_axis=data_axis,
        col_axis=col_axis,
        use_fused=use_fused,
        kernel=kernel,
        interpret=interpret,
    )
