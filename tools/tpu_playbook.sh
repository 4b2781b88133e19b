#!/bin/bash
# One-shot recovery playbook for when the remote TPU returns from an
# outage — the ROUND-5 sequence: validate the lane-paneled 'two' dot
# emission (the open perf lever), probe the 3-D streamed compile
# hazard, re-tune the affected table entries, then run the headline
# bench.  Each step is timeboxed and the script continues past
# failures (a wedged transport kills the step, not the playbook).
# NOTE: the dispatch table SHIPS pre-measured
# (libdwt_tpu/data/autotune.json) and bench.py never tunes in-process
# — only re-tune deliberately, and only commit a table that passes
# tests/test_autotune.py's consistency test.
#
#   bash tools/tpu_playbook.sh [logdir]
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_playbook}
mkdir -p "$LOG"

# 0. is the device actually there?
timeout 240 python -c "import jax; print(jax.devices())" \
    > "$LOG/devices.txt" 2>&1 || { echo "TPU still down"; exit 1; }

# 1. headline benchmark FIRST (emits its JSON line under every failure
#    mode; a warm .jax_cache makes this ~6 min, cold up to ~50) — even
#    a short device window must produce the artifact that matters
timeout 3000 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err" || true

# 2. lane-paneled interleaved-dot emission probes (VERDICT r05 lever):
#    bounded subprocess per config; a Mosaic wedge costs the timeout
timeout 4200 python tools/probe_two_emission.py \
    --configs two:1024 two:512 --timeout 1500 \
    > "$LOG/probe_two_fwd.json" 2> "$LOG/probe_two_fwd.err" || true
timeout 4200 python tools/probe_two_emission.py --inv \
    --configs two:1024 two:512 --timeout 1500 \
    > "$LOG/probe_two_inv.json" 2> "$LOG/probe_two_inv.err" || true

# 3. 3-D streamed compile-hazard probe (autotune.probe_volume_compile
#    runs in tune_dispatch3; --skip-2d keeps this to the vol entries).
#    A clean probe flips the shipped 'timeout' verdict and unpins the
#    measured 30% streamed win.
timeout 3600 python tools/tune.py --skip-2d --volume 64,512,512 \
    --packaged > "$LOG/tune3.log" 2>&1 || true

# 4. perf-plot artifact refresh (flushes incrementally; safe to kill)
timeout 2400 python examples/perf_plot.py \
    --sizes 512,1024,2144x4096 --levels 5 --trials 4 \
    --out-dir "$LOG/perf" > "$LOG/perfplot.log" 2>&1 || true

tail -3 "$LOG/bench.json" "$LOG/probe_two_fwd.json" \
    "$LOG/probe_two_inv.json"
