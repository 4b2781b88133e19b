"""Smallest possible program: full decomposition and back.

Analogue of /root/reference/examples/start/start.c: fill the standard
test image, forward CDF 9/7 at full depth (the reference's ``j = -1``),
inverse, done.  Everything defaulted — this is the "hello world".
"""
import numpy as np

import jax.numpy as jnp
from libdwt_tpu import fdwt2, idwt2
from libdwt_tpu.utils.subband import j_limit
from libdwt_tpu.utils.testimg import EPS, test_image


def main():
    y = x = 512
    img = jnp.asarray(test_image(y, x, dtype=np.float32))

    j = j_limit(y, x)  # full decomposition (reference j = -1)
    rec = idwt2(fdwt2(img, "cdf97", j), "cdf97", j)

    err = float(jnp.abs(rec - img).max())
    print(f"{y}x{x} CDF 9/7 full decomposition (J={j}): "
          f"round-trip max abs err = {err:.2e}")
    raise SystemExit(0 if err <= EPS else 1)


if __name__ == "__main__":
    main()
