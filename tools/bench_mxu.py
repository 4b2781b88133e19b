"""Calibrate MXU matmul throughput + error on the live chip.

Each measurement is ONE jitted program: K composition-chained matmuls
(y <- scale * (y @ B)) so no scan slicing, no per-step staging; the
per-op time is the slope between two chain lengths (fixed dispatch and
fence costs cancel — bench.py protocol).  A VPU FMA chain and a copy
chain are included as controls.  Run ALONE (timings drift under
process contention).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2048
CA, CB = 8, 32
TRIALS = 10


def fenced(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.device_get(out))
    return time.perf_counter() - t0


def slope_pair(fa, fb, args):
    best_a = best_b = float("inf")
    for _ in range(TRIALS):
        best_a = min(best_a, fenced(fa, *args))
        best_b = min(best_b, fenced(fb, *args))
    s = (best_b - best_a) / (CB - CA)
    fb_u = best_b / CB
    return (s, False) if 0 < s <= fb_u else (fb_u, True)


def make_chain(k, op):
    def chain(x):
        y = x
        for _ in range(k):
            y = op(y)
        return jnp.sum(y.reshape(-1)[:1])
    return jax.jit(chain)


def main():
    rng = np.random.RandomState(0)
    scale = 1.0 / (np.sqrt(N) * 0.2887)
    b = ((rng.rand(N, N) - 0.5).astype(np.float32))
    bd = jnp.asarray(b)
    bb16 = jnp.asarray(b.astype(jnp.bfloat16))
    x0 = jnp.asarray((rng.rand(N, N) - 0.5).astype(np.float32))
    x16 = jnp.asarray((rng.rand(N, N) - 0.5).astype(jnp.bfloat16))

    cases = []
    for prec in ("default", "high", "highest"):
        cases.append((
            f"f32 matmul {N}^3 precision={prec}",
            lambda y, p=prec: jnp.dot(y, bd, precision=p,
                                      preferred_element_type=jnp.float32)
            * scale,
            x0, 2 * N**3,
        ))
    cases.append((
        f"bf16 matmul {N}^3",
        lambda y: (jnp.dot(y, bb16, preferred_element_type=jnp.float32)
                   * scale).astype(jnp.bfloat16),
        x16, 2 * N**3,
    ))
    cases.append((
        "VPU fma pass (y*1.0001+0.1)",
        lambda y: y * 1.0001 + 0.1,
        x0, N * N,  # elem-ops
    ))

    for name, op, x, work in cases:
        fa = make_chain(CA, op)
        fb = make_chain(CB, op)
        float(jax.device_get(fa(x)))
        float(jax.device_get(fb(x)))
        s, fell = slope_pair(fa, fb, (x,))
        rate = work / s
        unit = "TF/s" if work > N * N else "Gelem/s"
        val = rate / 1e12 if work > N * N else rate / 1e9
        print(f"{name}: {s*1e6:.1f} us/op  {val:.1f} {unit}"
              f"{'  [slope-fallback]' if fell else ''}", flush=True)

    # numeric error of each precision vs float64 host reference
    a = np.asarray(x0, dtype=np.float64)
    ref = a @ b.astype(np.float64)
    mx = np.abs(ref).max()
    for prec in ("default", "high", "highest"):
        y = jax.jit(lambda u, p=prec: jnp.dot(u, bd, precision=p,
                    preferred_element_type=jnp.float32))(x0)
        err = float(np.abs(np.asarray(y) - ref).max() / mx)
        print(f"precision={prec}: maxrelerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
