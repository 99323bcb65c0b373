#!/bin/bash
# Chained after campaign/run_post_sgld.sh (PID via POST_SGLD_PID): if the
# payload's 3-seed sgld-quant CIFAR stage was skipped by its wall-clock
# cutoff, salvage what fits — seed-by-seed sgld quant a_7_w_8 cells
# (sweep DONE markers skip anything already complete), then refresh the
# cifar figures. Same cutoff discipline: TPU must be free by ~04:30.
set -x
cd /root/repo
LOG=${LOG:-/root/campaign_logs}
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
POST_SGLD_PID=${POST_SGLD_PID:?pass the running run_post_sgld.sh pid}
while kill -0 "$POST_SGLD_PID" 2>/dev/null; do sleep 60; done
echo "post-sgld driver $POST_SGLD_PID exited $(date)"

CUTOFF_MAIN=${CUTOFF_MAIN:-$(date -d "tomorrow 04:30" +%s)}
# if we are already past midnight the payload chain started yesterday,
# so 'tomorrow 04:30' would overshoot by a day — clamp to today 04:30
NOW=$(date +%s)
TODAY_CUT=$(date -d "today 04:30" +%s)
[ "$NOW" -lt "$TODAY_CUT" ] && CUTOFF_MAIN=$TODAY_CUT
fits() { [ "$(( $(date +%s) + $1 ))" -lt "$CUTOFF_MAIN" ]; }

# one sgld quant seed is ~4200 s (per-snapshot QAT, 15 snapshots)
for SEED in 1 2 3; do
  fits 4500 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds "$SEED" --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_s$SEED.log" 2>&1
done
# each single-seed sweep call re-aggregates -avg over ONE seed; rebuild
# the aggregate over every seed that actually completed (CPU-only, no JAX)
OUT="$OUT" python - <<'EOF'
import os, sys
sys.path.insert(0, '/root/repo')
from experiments import average_results
out = os.environ['OUT']
dirs = [os.path.join(out, f'sgld-cifar-a_7_w_8-seed{s}') for s in (1, 2, 3)]
dirs = [d for d in dirs if os.path.exists(os.path.join(d, 'DONE'))]
if dirs:
    average_results.main(
        dirs + ['--save', os.path.join(out, 'sgld-cifar-a_7_w_8-avg')])
EOF
fits 700 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar4.log" 2>&1
echo "POST_PAYLOAD_DONE $(date)"
