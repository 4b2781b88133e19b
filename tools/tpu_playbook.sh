#!/bin/bash
# One-shot recovery playbook for when the remote TPU returns from an
# outage: retune the dispatch table, run the headline bench, and sweep
# streamed strip sizes — in that order, so even a short device window
# produces committed artifacts.  Each step is timeboxed and the script
# continues past failures (a hung transport kills the step, not the
# playbook).
#
#   bash tools/tpu_playbook.sh [logdir]
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_playbook}
mkdir -p "$LOG"

# 0. is the device actually there?
timeout 240 python -c "import jax; print(jax.devices())" \
    > "$LOG/devices.txt" 2>&1 || { echo "TPU still down"; exit 1; }

# 1. dispatch table: fixes the stale 2048 'separable' entry and the
#    bogus 512 fwd entry (both from runs the outage killed mid-sweep)
timeout 4000 python tools/tune.py --packaged \
    --sizes 512,1024,2048 --levels 5 --trials 8 \
    > "$LOG/tune.json" 2> "$LOG/tune.err" || true

# 2. headline benchmark (self-retunes its bucket if step 1 died)
timeout 3000 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err" || true

# 3. strip-size ablation for the streamed whole-pyramid kernels; large
#    strips cut the halo re-read fraction (roofline math: ~0.99 vs
#    ~1.005 vs_baseline between ty=416 and ty=1056, VMEM permitting)
timeout 3600 python tools/ablate_streamed.py \
    --strips 256,416,544,704,1056 \
    > "$LOG/ablate.json" 2> "$LOG/ablate.err" || true

tail -5 "$LOG/tune.json" "$LOG/bench.json" "$LOG/ablate.json"
