#!/bin/bash
# Round-5 regression-tier CPU queue — finish the 40-cell quant grid
# (VERDICT r4 item 2). Unlike run_reg_r4fix.sh this does NOT archive
# anything: the round-4 scratch survived with all float ckpts (incl. the
# repaired sgld seed 3) and 13 healthy post-hashfix quant cells; this
# queue resumes by DONE markers. Run alongside the TPU queue (single
# core, nice'd). Prereq: sysctl -w vm.max_map_count=1048576 (CLAUDE.md).
#
# Stage 1 completes pointwise/mcdropout/bbb (17 method-cells, ~7-13 min
# each measured in round 4); stage 2 runs the whole sgld-regression grid
# (per-snapshot QAT, cost unknown) VALUE-FIRST so a cutoff still leaves
# the scientifically useful cells: a7w8 anchor, a7w4/a7w3 (the collapse),
# a4w8, then fill-in.
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
refig() {
  nice -n 10 python tools/reaggregate.py "$OUT" \
    > "$LOG/reagg_r5reg_$1.log" 2>&1
  nice -n 10 python tools/make_grid_plots.py "$OUT" --dataset regression \
    --out "$OUT/figures/regression" > "$LOG/figures_r5reg_$1.log" 2>&1
}

[ -f "$DATA/MANIFEST.txt" ] || \
  nice -n 10 python campaign/make_campaign_data.py --out "$DATA" \
    > "$LOG/make_data_reg_r5.log" 2>&1

# ---- stage 1: finish pointwise/mcdropout/bbb (cell-major, value-first)
for CELL in a_7_w_4 a_7_w_3 a_4_w_8 a_6_w_8 a_5_w_8 a_3_w_8; do
  for M in pointwise mcdropout bbb; do
    [ -f "$OUT/$M-regression-$CELL-seed3/DONE" ] && continue
    float_done "$M" && fits 1500 && \
    nice -n 10 python experiments/sweep.py quant --methods "$M" \
      --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
      --extra --data "$DATA" \
      > "$LOG/r5reg_${M}_${CELL}.log" 2>&1
  done
  refig "pmb_$CELL"
done

# ---- stage 2: the whole sgld-regression grid, value-first
for CELL in a_7_w_8 a_7_w_4 a_7_w_3 a_7_w_6 a_4_w_8 a_7_w_5 a_7_w_7 \
            a_6_w_8 a_5_w_8 a_3_w_8; do
  [ -f "$OUT/sgld-regression-$CELL-seed3/DONE" ] && continue
  float_done sgld && fits 3600 && \
  nice -n 10 python experiments/sweep.py quant --methods sgld \
    --tiers regression --seeds 1 2 3 --cells "$CELL" --out "$OUT" \
    --extra --data "$DATA" \
    > "$LOG/r5reg_sgld_${CELL}.log" 2>&1
  refig "sgld_$CELL"
done
echo "R5_REG_QUEUE_DONE $(date)"
