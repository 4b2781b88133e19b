"""Performance measurement harness and system info.

TPU-native analogue of the reference's perf layer:
  * dwt_util_perf_* / dwt_util_measure_perf_* protocol — M transforms
    x N trials, keep the minimum, report secs/pixel vs size, TSV output
    for gnuplot (/root/reference/src/libdwt.c:21391-21517, 22559-22646,
    :22640 TSV write);
  * clock abstraction (/root/reference/src/libdwt.h:1589-1658) — here
    time.perf_counter + jax.block_until_ready (device-inclusive);
  * dwt_util_print_info / host+device introspection
    (/root/reference/src/libdwt.c:20604-20638), extended with page-fault
    counters from the native backend (/root/reference/src/system.c:353).
"""
from __future__ import annotations

import ctypes
import time
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdwt_tpu.utils import nativelib

__all__ = ["measure", "measure_perf_2d", "pin_benchmark_env", "save_tsv",
           "page_faults", "info"]


def measure(
    fn: Callable, *args, trials: int = 5, warmup: int = 1, fence: bool = False
) -> float:
    """Min-of-N wall seconds of ``fn(*args)`` including device time
    (the reference's min-of-N rule, /root/reference/src/libdwt.c:21441-21481;
    cache flushing between runs is meaningless for HBM-resident data).

    ``fence=True``: ``fn`` must return a pytree whose FIRST leaf is a
    scalar checksum computed from its outputs; completion is forced by
    fetching that scalar.  Through a remote transport,
    ``block_until_ready`` has been observed to report readiness before
    the device finishes, but a device->host literal read cannot be
    faked — use fenced mode for any timing that feeds a decision.
    """

    def wait(out):
        if fence:
            float(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        else:
            jax.block_until_ready(out)

    for _ in range(warmup):
        wait(fn(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        wait(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_perf_2d(
    transform: Callable,
    sizes: Sequence[int] = (32, 64, 128, 256, 512, 1024),
    dtype=np.float32,
    trials: int = 5,
    fence: bool = True,
) -> List[Tuple[int, float, float]]:
    """Sweep square sizes; returns [(n, secs_per_pixel, mpix_per_s)].

    The dwt_util_measure_perf_cdf97_2_s analogue
    (/root/reference/src/libdwt.c:22559-22646).  ``fence=True`` (the
    default) wraps the transform with a scalar checksum and forces
    completion by fetching it — the only reliable fence through a
    remote transport (see :func:`measure`).
    """
    rows = []
    rng = np.random.RandomState(0)
    for n in sizes:
        data = rng.rand(n, n)
        if np.issubdtype(np.dtype(dtype), np.integer):
            data = data * 255  # an all-zero int image would fold away
        x = jnp.asarray(data.astype(dtype))
        if fence:
            def fenced(a, _t=transform):
                out = _t(a)
                leaves = jax.lax.optimization_barrier(
                    tuple(jax.tree_util.tree_leaves(out))
                )
                s = sum(
                    jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))
                    for leaf in leaves
                )
                return s, out

            fn = jax.jit(fenced)
        else:
            fn = jax.jit(transform)
        secs = measure(fn, x, trials=trials, fence=fence)
        spp = secs / (n * n)
        rows.append((n, spp, 1.0 / spp / 1e6))
    return rows


def measure_perf_1d(
    transform: Callable,
    lengths: Sequence[int] = (256, 1024, 4096, 16384, 65536),
    batch: int = 64,
    dtype=np.float32,
    trials: int = 5,
    fence: bool = True,
) -> List[Tuple[int, float, float]]:
    """Sweep 1-D signal lengths (a ``batch`` of rows per dispatch, the
    way the reference sweeps M-signal working sets); returns
    [(n, secs_per_sample, msamples_per_s)].

    The dwt_util_measure_perf_cdf97_1_s analogue
    (/root/reference/src/libdwt.c:22388)."""
    rows = []
    rng = np.random.RandomState(0)
    for n in lengths:
        x = jnp.asarray(rng.rand(batch, n).astype(dtype))

        def fenced(a, _t=transform):
            out = _t(a)
            leaves = jax.lax.optimization_barrier(
                tuple(jax.tree_util.tree_leaves(out))
            )
            s = sum(
                jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))
                for leaf in leaves
            )
            return s, out

        fn = jax.jit(fenced) if fence else jax.jit(transform)
        secs = measure(fn, x, trials=trials, fence=fence)
        sps = secs / (batch * n)
        rows.append((n, sps, 1.0 / sps / 1e6))
    return rows


def save_tsv(path: str, rows: Sequence[Tuple]) -> None:
    """Write sweep rows as TSV (gnuplot input, the reference's output
    format at /root/reference/src/libdwt.c:22640-22641)."""
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(str(v) for v in row) + "\n")


def page_faults() -> Tuple[int, int]:
    """(minor, major) page faults of this process
    (/root/reference/src/system.c:353); (0, 0) without the native lib."""
    lib = nativelib.get()
    if lib is None:
        return (0, 0)
    mn = ctypes.c_int64()
    mj = ctypes.c_int64()
    if lib.ldt_page_faults(ctypes.byref(mn), ctypes.byref(mj)) != 0:
        return (0, 0)
    return (mn.value, mj.value)


def info() -> Dict[str, object]:
    """Host + device info dict (dwt_util_print_info analogue)."""
    out: Dict[str, object] = {}
    try:
        devs = jax.devices()
        out["platform"] = devs[0].platform
        out["device_kind"] = devs[0].device_kind
        out["device_count"] = len(devs)
    except Exception:
        out["platform"] = "unavailable"
    lib = nativelib.get()
    if lib is not None:
        n = ctypes.c_int64()
        l1 = ctypes.c_int64()
        line = ctypes.c_int64()
        if lib.ldt_host_info(ctypes.byref(n), ctypes.byref(l1), ctypes.byref(line)) == 0:
            out["host_cpus"] = n.value
            out["l1_dcache_bytes"] = l1.value
            out["l1_line_bytes"] = line.value
    out["native_backend"] = nativelib.available()
    return out


def pin_benchmark_env(cpu: int = 0, realtime: bool = False) -> bool:
    """Benchmark hygiene: pin affinity (and optionally SCHED_FIFO) like
    the reference's env_single_threading + realtime scheduler
    (/root/reference/src/system.c:305-351,475-521).  Returns True if the
    affinity pin succeeded."""
    lib = nativelib.get()
    if lib is None:
        return False
    ok = lib.ldt_set_affinity(cpu) == 0
    if realtime:
        lib.ldt_set_realtime()  # usually needs privileges; best-effort
    return ok
