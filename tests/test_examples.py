"""Smoke-run every example program (tiny sizes, CPU).

The reference's examples double as its integration tests (each has a
``make run`` target, /root/reference/common.mk:30-32); this is the
pytest analogue: every program must run to completion on a small
configuration.
"""
import os
import subprocess
import sys

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

#: example -> small-config argv (kept < a few seconds each on CPU)
_CASES = {
    "simple.py": ["--size", "64", "--levels", "3"],
    "cores.py": ["--size", "64"],
    "subbands.py": ["--size", "64", "--levels", "2"],
    "denoise.py": ["--size", "64", "--levels", "2"],
    "mra.py": ["--n", "128", "--levels", "3"],
    "similarity.py": ["--size", "64", "--levels", "2"],
    "filter_coeffs.py": [],
    "function_iterating.py": ["--size", "128"],
    "wavelet_func.py": ["--levels", "4", "--n", "128"],
    "spectra_fe.py": ["--n-signals", "4", "--length", "128", "--levels", "2"],
    "timefreq.py": ["--size", "128", "--bins", "16"],
    "io_roundtrip.py": ["--size", "32"],
    "hdr_eaw.py": ["--size", "32", "--levels", "2"],
    "sharded_demo.py": ["--levels", "1", "--width", "64"],
    "perf_sweep.py": ["--sizes", "32", "--levels", "2", "--impl", "separable"],
    "spectra_swt.py": ["--n-signals", "4", "--length", "128", "--levels", "2"],
    "displ_vectors.py": ["--count", "8", "--levels", "3", "--keep", "40"],
    "nsls_demo.py": ["--size", "64"],
    "wavelet_func2d.py": ["--size", "64"],
    "cdf97_test.py": ["--size", "64", "--levels", "2"],
    "interop_flags.py": ["--size", "48", "--levels", "2"],
    "eaw_demo.py": ["--size", "64", "--levels", "2"],
    "spectra_tf.py": ["--size", "128", "--bins", "16"],
    "start.py": [],
    "load.py": ["missing.pgm"],
    "spectra_blobs.py": ["--n", "256", "--bins", "32", "--components", "3",
                         "--ridges", "6"],
    "info.py": [],
    "simple_variants.py": ["--size", "64", "--levels", "2"],
    "interop_subbands.py": ["--size", "50", "--levels", "2"],
    "accel_matrix.py": ["--size", "128", "--levels", "2"],
    "spectra_svm.py": ["--n-signals", "32", "--length", "128",
                       "--levels", "3", "--features", "wps"],
    "spectra_dwt.py": ["--n-signals", "4", "--length", "128",
                       "--levels", "2"],
    "perf_plot.py": ["--sizes", "64", "--levels", "2", "--impls",
                     "separable", "--dirs", "fwd", "--trials", "1",
                     "--chains", "2,4", "--out-dir", "/tmp/pp-test"],
    "perf_line.py": ["--lengths", "256,1024", "--batch", "8",
                     "--levels", "2", "--trials", "1"],
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_example_runs(name, tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # the examples import libdwt_tpu; make the repo root visible to the
    # subprocess whether or not the package is pip-installed (the
    # subprocess's sys.path[0] is examples/, not the repo root)
    repo_root = os.path.abspath(os.path.join(_EXAMPLES_DIR, ".."))
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = repo_root + (os.pathsep + prev if prev else "")
    script = os.path.join(_EXAMPLES_DIR, name)
    args = list(_CASES[name])
    # route file outputs into the sandbox
    if name in ("io_roundtrip.py", "mra.py", "spectra_fe.py", "timefreq.py",
                "function_iterating.py", "spectra_swt.py",
                "displ_vectors.py", "wavelet_func2d.py"):
        args += ["--out", str(tmp_path / "out")]
    res = subprocess.run(
        [sys.executable, script, *args],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, (
        f"{name} failed\nstdout:\n{res.stdout[-2000:]}\n"
        f"stderr:\n{res.stderr[-2000:]}"
    )
