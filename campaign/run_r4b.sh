#!/bin/bash
# Round-4 continuation queue: the CIFAR tier, floats-first.
#
# Swapped in at the stage-2 boundary of run_r4.sh (touch
# /root/campaign_stop, wait for it to exit, rm the stop file, launch
# this): with ~4h of TPU left the original stage order (pw/mcd float +
# quant, THEN sgld float + quant) would have dropped sgld-cifar entirely
# — but the highest-value artifact is the 4-METHOD float candlestick, so
# all three missing floats run before any quant cell, then the a7w8
# quants in cost order (pointwise/mcdropout ~0.5 h each, sgld ~1 h), then
# the perf refreshes. Same rails as run_r4.sh: lockfile, float-DONE
# gating, movable cutoff, DONE-marker resume, 3 seeds per process.
set -x
cd /root/repo || exit 1
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT

LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}

cutoff() {
  if [ -f /root/campaign_cutoff ]; then cat /root/campaign_cutoff;
  else date -d "+4 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() {
  [ -f "$OUT/$1-$2-seed1/DONE" ] && [ -f "$OUT/$1-$2-seed2/DONE" ] &&
  [ -f "$OUT/$1-$2-seed3/DONE" ]
}

# ---- stage A: the three missing CIFAR floats (4-method float figures)
for M in pointwise mcdropout; do
  fits 4200 && \
  python experiments/sweep.py float --methods "$M" --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_$M.log" 2>&1
done
fits 5400 && \
python experiments/sweep.py float --methods sgld --tiers cifar \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_float_sgld.log" 2>&1
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar_f.log" 2>&1
fits 900 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar_f.log" 2>&1
touch "$OUT/.stage_cifar_floats_attempted"

# ---- stage B: a7w8 quants, cheapest first
for M in pointwise mcdropout; do
  float_done "$M" cifar && fits 2400 && \
  python experiments/sweep.py quant --methods "$M" --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_$M.log" 2>&1
done
float_done sgld cifar && fits 3600 && \
python experiments/sweep.py quant --methods sgld --tiers cifar \
  --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_quant_sgld.log" 2>&1
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar_q.log" 2>&1
fits 900 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar_q.log" 2>&1
touch "$OUT/.stage_cifar_quants_attempted"

# ---- stage C: perf refreshes
fits 1800 && python tools/bench_suite.py > "$LOG/suite_r4.log" 2>&1
fits 1500 && python tools/bench_serving.py \
  --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
  > "$LOG/serving_r4.log" 2>&1
fits 600 && python bench.py > "$LOG/bench_r4.log" 2>&1
echo "R4B_QUEUE_DONE $(date)"
