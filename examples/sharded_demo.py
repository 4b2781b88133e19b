"""Multi-chip sharded transform on a virtual device mesh.

Demonstrates the distributed path (absent from the reference, which is
single-process): row-sharded 2-D MRA with ppermute halo exchange, then
the same frame block-sharded over a (rows, cols) mesh (the shard_map
analogue of the reference's BLOCKS traversal order,
/root/reference/src/dwt-core.h:76-99).
Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
for 8 virtual devices, or on a real multi-chip TPU slice.
"""
import argparse
import os

# must be set before jax initializes a backend
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--width", type=int, default=256)
    args = ap.parse_args()

    try:
        enough = jax.device_count() >= 8
    except RuntimeError:
        enough = False
    if not enough:
        jax.config.update("jax_platforms", "cpu")

    from libdwt_tpu.parallel import (
        make_mesh_2d,
        sharded_wavedec2,
        sharded_waverec2,
    )
    from libdwt_tpu.utils.testimg import test_image

    n_space = 4
    n_data = 2
    mesh = make_mesh_2d(n_data, n_space)
    h = n_space * (1 << args.levels) * 8
    x = jnp.asarray(test_image(h, args.width, dtype=np.float32))

    @jax.jit
    def step(a):
        c = sharded_wavedec2(a, "cdf97", args.levels, mesh=mesh)
        return sharded_waverec2(c, "cdf97", mesh=mesh)

    rec = step(x)
    err = float(jnp.abs(rec - x).max())
    print(f"mesh {dict(mesh.shape)} image {x.shape} "
          f"J={args.levels}: round-trip err {err:.2e}")

    # the same frame over a 2x4 (rows x cols) block mesh
    from libdwt_tpu.parallel import make_mesh_blocks

    bmesh = make_mesh_blocks(1, 2, 4)
    wb = 4 * (1 << args.levels) * max(8, args.width // (4 * (1 << args.levels)))
    hb = 2 * (1 << args.levels) * 8
    xb = jnp.asarray(test_image(hb, wb, dtype=np.float32))

    @jax.jit
    def block_step(a):
        c = sharded_wavedec2(a, "cdf97", args.levels, mesh=bmesh,
                             space_axis="rows", col_axis="cols")
        return sharded_waverec2(c, "cdf97", mesh=bmesh,
                                space_axis="rows", col_axis="cols")

    rec = block_step(xb)
    err = float(jnp.abs(rec - xb).max())
    print(f"block mesh {dict(bmesh.shape)} image {xb.shape} "
          f"J={args.levels}: round-trip err {err:.2e}")


if __name__ == "__main__":
    main()
