"""The reference's 'simple' program family in one driver: float32,
float64, reversible integer and interpolating-wavelet round trips.

Analogues: /root/reference/examples/simple (float), simple-double
(double), simple-int (reversible CDF 5/3 integers), simple-interpl
(interpolating 5/3).  Each prints the round-trip error; integers must
reconstruct EXACTLY (dwt_util_compare_i semantics,
/root/reference/src/libdwt.h:1432).

    python examples/simple_variants.py --size 512 --levels 3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    import numpy as np

    import jax.numpy as jnp
    from libdwt_tpu import fdwt2, idwt2
    from libdwt_tpu.utils.testimg import psnr, test_image

    n, j = args.size, args.levels
    img = test_image(n, n)

    # float32 (the 'simple' program)
    x = jnp.asarray(img, jnp.float32)
    rec = idwt2(fdwt2(x, "cdf97", j), "cdf97", j)
    err = float(jnp.abs(rec - x).max())
    print(f"float32  cdf97  J={j}: max|err|={err:.3e} "
          f"psnr={psnr(np.asarray(x), np.asarray(rec)):.1f} dB")
    assert err <= 1e-3  # the reference's epsilon (libdwt.c:1593-1620)

    # float64 (the 'simple-double' program; needs x64)
    xd = jnp.asarray(img, jnp.float64)
    recd = idwt2(fdwt2(xd, "cdf97", j), "cdf97", j)
    errd = float(jnp.abs(recd - xd).max())
    print(f"float64  cdf97  J={j}: max|err|={errd:.3e}")
    assert errd < 1e-9

    # reversible integer CDF 5/3 (the 'simple-int' program): bit-exact
    xi = jnp.asarray((img * 255).astype(np.int32))
    reci = idwt2(fdwt2(xi, "cdf53", j), "cdf53", j)
    exact = bool((reci == xi).all())
    print(f"int32    cdf53  J={j}: bit-exact={exact}")
    assert exact

    # interpolating 5/3 (the 'simple-interpl' program)
    ri = idwt2(fdwt2(x, "interp53", j), "interp53", j)
    erri = float(jnp.abs(ri - x).max())
    print(f"float32  interp53 J={j}: max|err|={erri:.3e}")
    assert erri <= 1e-3
    print("all simple variants round-trip OK")


if __name__ == "__main__":
    main()
