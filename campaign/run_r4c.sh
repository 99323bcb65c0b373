#!/bin/bash
# Round-4 second continuation queue: (1) repair the mcdropout-cifar
# float leg — a TPU worker restart (UNAVAILABLE, the same fault class
# that killed round-3's bench_suite run) crashed the stage-A sweep mid
# eval on seed 1, so its quant gate in run_r4b.sh stage B fails closed —
# then (2) extra CIFAR quant cells beyond the VERDICT-minimum a7w8,
# enabled by this session's later round end (the 16:00 cutoff was pinned
# by the previous session; this one moved it to 17:45 UTC).
#
# Launch pattern: started alongside run_r4b.sh; sleeps until r4b exits
# (releases /root/campaign_tpu.lock after its stage-C perf refreshes),
# then takes the lock itself. CELL-MAJOR like run_reg_cells.sh — each
# precision cell runs pointwise -> mcdropout -> sgld x 3 seeds before
# the next cell, so the 17:45 cutoff truncates the grid uniformly and
# every completed cell extends the 4-method CIFAR bit-width lines by one
# point (bbb already has the full grid from round 3). Cell order is
# value-first: w4 (the degradation region the paper centres on), w6
# (survival region), w3 (collapse), a4 (activation-sweep counterpart),
# then the rest of the reference grid (run_all_quant.sh:67-85).
# Same rails: lockfile, float-DONE gating, movable cutoff
# (/root/campaign_cutoff), stop file, sweep DONE-marker resume.
set -x
cd /root/repo || exit 1
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}

# wait for r4b to finish and release the TPU lock
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done

LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT

cutoff() {
  if [ -f /root/campaign_cutoff ]; then cat /root/campaign_cutoff;
  else date -d "+2 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() {
  [ -f "$OUT/$1-cifar-seed1/DONE" ] && [ -f "$OUT/$1-cifar-seed2/DONE" ] &&
  [ -f "$OUT/$1-cifar-seed3/DONE" ]
}

# ---- stage 0: repair the crashed mcdropout float leg + its a7w8 quant
# (sweep resume clears the half-written seed-1 dir and re-runs it)
if ! float_done mcdropout; then
  fits 4200 && \
  python experiments/sweep.py float --methods mcdropout --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_mcdropout_retry.log" 2>&1
fi
float_done mcdropout && [ ! -f "$OUT/mcdropout-cifar-a_7_w_8-seed3/DONE" ] \
  && fits 2400 && \
  python experiments/sweep.py quant --methods mcdropout --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_mcdropout_retry.log" 2>&1
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar_mcdfix.log" 2>&1
fits 900 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar_mcdfix.log" 2>&1
touch "$OUT/.stage_cifar_mcdfix_attempted"

for CELL in a_7_w_4 a_7_w_6 a_7_w_3 a_4_w_8 a_7_w_5 a_6_w_8 a_5_w_8 \
            a_3_w_8 a_7_w_7; do
  for M in pointwise mcdropout; do
    float_done "$M" && fits 2400 && \
    python experiments/sweep.py quant --methods "$M" --tiers cifar \
      --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/cifar_quant_${M}_${CELL}.log" 2>&1
  done
  float_done sgld && fits 3600 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_${CELL}.log" 2>&1
  python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar_$CELL.log" 2>&1
  fits 900 && \
  python tools/make_grid_plots.py "$OUT" --dataset cifar \
    --out "$OUT/figures/cifar" > "$LOG/figures_cifar_$CELL.log" 2>&1
  touch "$OUT/.cell_cifar_${CELL}_attempted"
done
echo "R4C_QUEUE_DONE $(date)"
