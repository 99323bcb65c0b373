#!/bin/bash
# Regression-tier continuation queue: CELL-MAJOR over the quant grid.
#
# Swapped in at the stage-Q1 boundary of run_regression_cpu.sh (the same
# stop-file mechanism run_r4b.sh used on the TPU queue): the original
# Q2/Q3/Q4 stages are method-major (bbb's full grid, then pw+mcd, then
# sgld), so a wall-clock cutoff leaves whole methods without quant cells
# and the 4-method comparison figures can't extend past a7w8. This queue
# runs each precision cell across ALL FOUR methods x 3 seeds before
# moving to the next cell (weight sweep first, then activation sweep —
# the reference's own order, run_all_quant.sh:11-61), so however far the
# cutoff lets it run, every completed cell carries the full method
# comparison. Reaggregate + figures refresh at every cell boundary.
#
# Same rails: lockfile, float-DONE gating, movable cutoff
# (/root/campaign_cutoff_reg), stop file (/root/campaign_stop_reg),
# sweep-level DONE-marker resume, 3 seeds per process (shared jit cache).
set -x
cd /root/repo || exit 1
LOCK=/root/campaign_reg.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT

LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
export QBN_CPU=1

cutoff() {
  if [ -f /root/campaign_cutoff_reg ]; then cat /root/campaign_cutoff_reg;
  else date -d "+8 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop_reg ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() {
  [ -f "$OUT/$1-regression-seed1/DONE" ] &&
  [ -f "$OUT/$1-regression-seed2/DONE" ] &&
  [ -f "$OUT/$1-regression-seed3/DONE" ]
}

for CELL in a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for M in pointwise mcdropout bbb; do
    float_done "$M" && fits 1500 && \
    nice -n 10 python experiments/sweep.py quant --methods "$M" \
      --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
      --extra --data "$DATA" \
      > "$LOG/reg_quant_${M}_${CELL}.log" 2>&1
  done
  float_done sgld && fits 2700 && \
  nice -n 10 python experiments/sweep.py quant --methods sgld \
    --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
    --extra --data "$DATA" \
    > "$LOG/reg_quant_sgld_${CELL}.log" 2>&1
  nice -n 10 python tools/reaggregate.py "$OUT" \
    > "$LOG/reagg_reg_$CELL.log" 2>&1
  nice -n 10 python tools/make_grid_plots.py "$OUT" --dataset regression \
    --out "$OUT/figures/regression" > "$LOG/figures_reg_$CELL.log" 2>&1
  touch "$OUT/.cell_reg_${CELL}_attempted"
done
echo "REG_CELLS_DONE $(date)"
