"""Headline benchmark: Mpix/s/chip for 4K multi-level CDF 9/7 2-D DWT.

Protocol: the reference's min-of-N discipline
(/root/reference/src/libdwt.c:21441-21507) — N blocking dispatches over
rotating distinct input frames, keep the fastest.  Blocking (device
round trip per frame) is the conservative choice for a remote-attached
device: enqueue-style throughput measurement is not defensible through
a transport whose readiness semantics cannot be audited, so the
reported number includes dispatch latency and underestimates the
device's sustained rate.

Config: 4K frame (2144x4096 after J=5 alignment), f32, CDF 9/7, J=5,
symmetric extension.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

The reference publishes no absolute numbers (BASELINE.md), so
``vs_baseline`` compares against the driver-defined target instead:
90% of the single-chip HBM roofline for the minimal traffic of a fused
multi-level transform (sum_j 8B/4^j ~ 10.67 B/pixel at the nominal
819 GB/s).  vs_baseline >= 1.0 means target met.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compiles (harmless if the backend ignores it)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


H, W = 2160, 4096  # "4K frame" (UHD-ish); J=5 needs H,W divisible by 32
LEVELS = 5
N_BUFFERS = 4
# remote-attached dispatch jitters heavily; many cheap trials + min is
# the robust estimator
TRIALS = 60
WARMUP = 5

# HBM bandwidth per chip, GB/s (public specs).
_BW_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def device_bw_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _BW_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def _correctness_gates():
    """BASELINE.md gates, run AFTER timing: executing eager (op-by-op)
    programs first was observed to poison the remote terminal's program
    cache and slow every later dispatch ~200x.  Jitted single programs,
    after the measurement, are safe."""
    from libdwt_tpu import fdwt2, idwt2
    from libdwt_tpu.utils.testimg import EPS, test_image

    xi = jnp.asarray(test_image(256, 256, dtype=np.int32))
    ri = jax.jit(lambda a: idwt2(fdwt2(a, "cdf53", 3), "cdf53", 3))(xi)
    assert bool((ri == xi).all()), "int round trip not bit-exact"
    xf = jnp.asarray(test_image(256, 256, dtype=np.float32))
    rf = jax.jit(lambda a: idwt2(fdwt2(a, "cdf97", 3), "cdf97", 3))(xf)
    assert float(jnp.abs(rf - xf).max()) <= EPS, "float round trip out of eps"


def main():
    from libdwt_tpu.api import wavedec2

    h = (H // (1 << LEVELS)) * (1 << LEVELS)
    w = (W // (1 << LEVELS)) * (1 << LEVELS)
    rng = np.random.RandomState(0)
    xs = [
        jnp.asarray(rng.rand(h, w).astype(np.float32)) for _ in range(N_BUFFERS)
    ]

    fn = jax.jit(lambda a: wavedec2(a, "cdf97", LEVELS))
    for i in range(WARMUP):
        jax.block_until_ready(fn(xs[i % N_BUFFERS]))

    def measure_best():
        best = float("inf")
        for i in range(TRIALS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xs[i % N_BUFFERS]))
            best = min(best, time.perf_counter() - t0)
        return best

    # Dispatch latency drifts on ~10 s scales; three spaced passes give
    # the min a chance to land in a good window.
    best = measure_best()
    for _ in range(2):
        time.sleep(10)
        best = min(best, measure_best())

    # The remote transport occasionally degrades by >100x for minutes at
    # a time; a frame time far above any plausible device+dispatch cost
    # indicates such a window, not the kernel.  Wait it out, but keep the
    # retry budget time-bounded so a result always prints even under an
    # external timeout.
    degraded_threshold = 2e-3  # 2 ms/frame ~ 10x worst healthy value
    retry_deadline = time.monotonic() + 180.0
    while best > degraded_threshold and time.monotonic() < retry_deadline:
        print(
            f"# transport degraded ({best*1e3:.1f} ms/frame); retrying...",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(30)
        best = min(best, measure_best())

    mpix_s = (h * w) / best / 1e6

    _correctness_gates()

    # Minimal HBM traffic for the level pyramid: level j reads+writes
    # h*w/4^j pixels at 4B each.
    bytes_per_pixel = sum(8.0 / 4**j for j in range(LEVELS))
    roofline_mpix_s = device_bw_gbps() * 1e9 / bytes_per_pixel / 1e6
    target = 0.9 * roofline_mpix_s

    print(
        json.dumps(
            {
                "metric": "cdf97_2d_fwd_4k_j5_f32",
                "value": round(mpix_s, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / target, 4),
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} best={best*1e3:.2f} ms "
        f"roofline={roofline_mpix_s:.0f} Mpix/s target(90%)={target:.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
