#!/bin/bash
# Round-3 chained TPU driver (resumes the crashed session's plan):
#   wait for the running campaign driver to exit (it is finishing the
#   bbb mnist quant stage + figures) -> TPU perf session -> sgld mnist
#   quant stage (its .done marker was set deliberately so the main
#   driver defers it) -> figure re-render over the complete grid.
# One TPU process at a time (CLAUDE.md); everything here runs strictly
# after the previous TPU job exits.
set -x
cd /root/repo
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
LOG=${LOG:-/root/campaign_logs}

CAMPAIGN_PID=${CAMPAIGN_PID:?pass the running run_campaign.sh pid}
while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do sleep 60; done
echo "campaign driver $CAMPAIGN_PID exited $(date)"

bash tools/perf_session.sh > "$LOG/perf_session.log" 2>&1
echo "perf session done $(date)"

python experiments/sweep.py quant --methods sgld --tiers mnist \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/mnist_quant_sgld2.log" 2>&1
echo "sgld quant exit $? $(date)"

python tools/make_grid_plots.py "$OUT" --dataset mnist \
  --out "$OUT/figures/mnist" > "$LOG/figures_mnist2.log" 2>&1
echo "POST_BBB_DONE $(date)"
