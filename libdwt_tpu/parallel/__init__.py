"""Multi-chip parallelism: meshes, sharded transforms, halo exchange."""

from libdwt_tpu.parallel.sharded import (
    HALO,
    make_mesh_2d,
    make_mesh_blocks,
    sharded_dwt2_level,
    sharded_idwt2_level,
    sharded_wavedec2,
    sharded_wavedec3,
    sharded_waverec2,
    sharded_waverec3,
)

__all__ = [
    "HALO",
    "make_mesh_2d",
    "make_mesh_blocks",
    "sharded_dwt2_level",
    "sharded_idwt2_level",
    "sharded_wavedec2",
    "sharded_wavedec3",
    "sharded_waverec2",
    "sharded_waverec3",
]
