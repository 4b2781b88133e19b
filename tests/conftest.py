"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's practice of testing accelerator paths via portable
fallbacks on the PC (/root/reference/src/libdwt.c:9501-9504): sharded
multi-chip code paths are exercised on host-platform virtual devices;
the real-TPU path is exercised by bench.py / __graft_entry__.py.

Note: in this environment a sitecustomize hook registers a remote-TPU
(axon) PJRT plugin and flips jax_platforms to "axon,cpu", which routes
every XLA compile through an RPC (~seconds each).  The suite compiles
hundreds of tiny shape-specialized programs, so we pin the platform back
to local CPU before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of tiny
# shape-specialized programs; caching them makes re-runs several times
# faster.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass
