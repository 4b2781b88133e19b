"""Collective accounting for the sharded transforms.

The round-2 redesign halved the halo-exchange collective count (one
signal-row exchange per forward level instead of one per pass; stacked
channel pairs on the inverse).  This module makes such claims TESTABLE
without hardware: it walks the jaxpr of any function and counts the
communication primitives and the bytes they move — the TPU-native
analogue of the reference's perf-counter instrumentation
(/root/reference/src/system.c:475-521, page-fault/cache counters per
transform), applied to the quantity that governs multi-chip scaling
(ICI traffic) instead of single-core cache misses.

``collective_stats(fn)(*args)`` returns {primitive: {"count": n,
"bytes": b}} where bytes counts each collective's OPERAND payload once
per issue (a ppermute moves its operand once over the interconnect;
loop-body collectives are multiplied by the trip count).
bench_scaling.py records these next to its measured efficiencies so
the artifact pins the collective schedule, not just wall clock.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np

__all__ = ["collective_stats", "jaxpr_collective_stats"]

#: communication primitives worth accounting (name -> True if the
#: payload crosses the interconnect once per issue).
_COMM_PRIMS = (
    "ppermute",
    "all_gather",
    "all_to_all",
    "psum",
    "reduce_scatter",
    "psum_scatter",
)


def _leaf_bytes(v) -> int:
    aval = getattr(v, "aval", None)
    if aval is None or not hasattr(aval, "shape"):
        return 0
    try:
        return int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize
    except Exception:
        return 0


def jaxpr_collective_stats(jaxpr, _mult: int = 1) -> Dict[str, Dict[str, int]]:
    """Count communication primitives (and operand bytes) in a jaxpr,
    recursing into sub-jaxprs (pjit/shard_map bodies, control flow).
    ``scan``/``while`` bodies are multiplied by their trip count where
    it is static (scan ``length``); unknown trip counts count once."""
    stats: Dict[str, Dict[str, int]] = {}

    def add(name: str, count: int, nbytes: int) -> None:
        slot = stats.setdefault(name, {"count": 0, "bytes": 0})
        slot["count"] += count
        slot["bytes"] += nbytes

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in _COMM_PRIMS:
            payload = sum(_leaf_bytes(v) for v in eqn.invars)
            add(prim, _mult, _mult * payload)
            continue
        mult = _mult
        if prim == "scan":
            mult = _mult * int(eqn.params.get("length", 1))
        for key, val in eqn.params.items():
            for sub in _iter_jaxprs(val):
                for name, slot in jaxpr_collective_stats(sub, mult).items():
                    add(name, slot["count"], slot["bytes"])
    return stats


def _iter_jaxprs(val):
    from jax._src import core as jcore

    if isinstance(val, jcore.ClosedJaxpr):
        yield val.jaxpr
    elif isinstance(val, jcore.Jaxpr):
        yield val
    elif isinstance(val, (tuple, list)):
        for v in val:
            yield from _iter_jaxprs(v)


def collective_stats(fn: Callable, *args, **kwargs) -> Dict[str, Dict[str, int]]:
    """Trace ``fn(*args, **kwargs)`` (no execution) and account its
    communication primitives.  Accepts concrete arrays or
    ShapeDtypeStructs."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_collective_stats(closed.jaxpr)
