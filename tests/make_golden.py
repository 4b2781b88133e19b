"""Convert .refbuild/golden.bin (dumped by the reference library via
.refbuild/gen_golden.c) into tests/golden/golden.npz.

Run manually when regenerating golden vectors:
    cd .refbuild && ./gen_golden && cd .. && python tests/make_golden.py
"""
import os
import struct
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", ".refbuild", "golden.bin")
DST = os.path.join(HERE, "golden", "golden.npz")

DTYPES = {"f32": np.float32, "f64": np.float64, "i32": np.int32}


def main():
    arrays = {}
    with open(SRC, "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                break
            (namelen,) = struct.unpack("<i", head)
            name = f.read(namelen).decode()
            (dtypelen,) = struct.unpack("<i", f.read(4))
            dtype = DTYPES[f.read(dtypelen).decode()]
            ny, nx = struct.unpack("<ii", f.read(8))
            data = np.frombuffer(
                f.read(ny * nx * np.dtype(dtype).itemsize), dtype=dtype
            ).reshape(ny, nx)
            arrays[name] = data
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    np.savez_compressed(DST, **arrays)
    print(f"wrote {len(arrays)} arrays to {DST}")


if __name__ == "__main__":
    main()
