#!/bin/bash
# One-shot recovery playbook for when the remote TPU returns from an
# outage: warm the bench (the headline deliverable) first, then the
# optional extras — so even a short device window produces the
# artifact that matters.  Each step is timeboxed and the script
# continues past failures (a wedged transport kills the step, not the
# playbook).  NOTE the round-4 state: the dispatch table SHIPS
# pre-measured (libdwt_tpu/data/autotune.json) and bench.py never
# tunes in-process — only re-tune deliberately, and only commit a
# table that passes tests/test_autotune.py's consistency test.
#
#   bash tools/tpu_playbook.sh [logdir]
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_playbook}
mkdir -p "$LOG"

# 0. is the device actually there?
timeout 240 python -c "import jax; print(jax.devices())" \
    > "$LOG/devices.txt" 2>&1 || { echo "TPU still down"; exit 1; }

# 1. headline benchmark (emits its JSON line under every failure mode;
#    a warm .jax_cache makes this ~6 min, cold up to ~50)
timeout 3000 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err" || true

# 2. perf-plot artifact refresh (flushes incrementally; safe to kill)
timeout 2400 python examples/perf_plot.py \
    --sizes 512,1024,2144x4096 --levels 5 --trials 4 \
    --out-dir "$LOG/perf" > "$LOG/perfplot.log" 2>&1 || true

# 3. strip-size ablation for the streamed whole-pyramid kernels
#    (round-4 sweep: 320 is the knee at 4K; see BENCH_NOTES)
timeout 2400 python tools/ablate_body.py --bodies poly \
    --strips 256,320,416 --levels 5 --trials 4 \
    > "$LOG/ablate.json" 2> "$LOG/ablate.err" || true

tail -3 "$LOG/bench.json" "$LOG/ablate.json"
