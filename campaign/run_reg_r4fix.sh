#!/bin/bash
# Regression-tier POST-HASHFIX rebuild queue.
#
# qbn_tpu/data/uci.py seeded the zero-egress UCI fallback tables from
# salted str hash(): every process regenerated DIFFERENT table bytes, so
# each quant run fine-tuned float checkpoints against data they were
# never trained on — every UCI INT cell collapsed to constant-prediction
# RMSE (float metrics, trained+evaluated within one process, stayed
# healthy; regression_synthetic has an explicit seed and was fine; the
# parity harness writes real table files and never hits the fallback).
# After the deterministic-digest fix the whole tier must re-run from
# float: stop the contaminated cell-major queue, ARCHIVE its trees out
# of the campaign output (forensics copy, excluded from aggregation),
# re-run all 4 float legs, then the cell-major quant grid with the a7w8
# anchor cell first.
#
# Same rails as run_reg_cells.sh: lockfile, float-DONE gating, movable
# cutoff (/root/campaign_cutoff_reg), stop file, DONE-marker resume.
set -x
cd /root/repo || exit 1
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
export QBN_CPU=1

# stop the running contaminated queue at its next cell boundary
touch /root/campaign_stop_reg
while [ -d /root/campaign_reg.lock ]; do sleep 30; done
rm -f /root/campaign_stop_reg

LOCK=/root/campaign_reg.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT

# archive every pre-fix regression tree (float ckpts unusable for quant:
# their table bytes are irrecoverable; quant cells trained on mismatched
# data)
ARCHIVE=/root/campaign_prehashfix
mkdir -p "$ARCHIVE"
for d in "$OUT"/pointwise-regression* "$OUT"/mcdropout-regression* \
         "$OUT"/bbb-regression* "$OUT"/sgld-regression*; do
  [ -e "$d" ] && mv "$d" "$ARCHIVE/"
done
rm -f "$OUT"/.cell_reg_*_attempted "$OUT"/.stage_reg_*_attempted

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

# ---- floats (all 4 methods x 3 seeds)
for M in pointwise mcdropout bbb sgld; do
  fits 3600 && \
  nice -n 10 python experiments/sweep.py float --methods "$M" \
    --tiers regression --seeds 1 2 3 --out "$OUT" --extra \
    --data "$DATA" > "$LOG/reg_refloat_$M.log" 2>&1
done
nice -n 10 python tools/reaggregate.py "$OUT" \
  > "$LOG/reagg_reg_refloat.log" 2>&1
touch "$OUT/.stage_reg_refloat_attempted"

# ---- cell-major quant grid, anchor cell first
for CELL in a_7_w_8 a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for M in pointwise mcdropout bbb; do
    float_done "$M" && fits 1500 && \
    nice -n 10 python experiments/sweep.py quant --methods "$M" \
      --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
      --extra --data "$DATA" \
      > "$LOG/reg_requant_${M}_${CELL}.log" 2>&1
  done
  float_done sgld && fits 2700 && \
  nice -n 10 python experiments/sweep.py quant --methods sgld \
    --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
    --extra --data "$DATA" \
    > "$LOG/reg_requant_sgld_${CELL}.log" 2>&1
  nice -n 10 python tools/reaggregate.py "$OUT" \
    > "$LOG/reagg_regfix_$CELL.log" 2>&1
  nice -n 10 python tools/make_grid_plots.py "$OUT" --dataset regression \
    --out "$OUT/figures/regression" > "$LOG/figures_regfix_$CELL.log" 2>&1
  touch "$OUT/.cell_regfix_${CELL}_attempted"
done
echo "REG_R4FIX_DONE $(date)"
