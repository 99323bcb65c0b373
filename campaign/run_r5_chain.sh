#!/bin/bash
# Round-5 chain v2: after the primary TPU queue exits — (1) repair the
# mcdropout-cifar a_7_w_8 cell a transient relay failure killed at
# 06:10 UTC (the PRIMARY INT8 cell: the 4-method int8 candlestick needs
# it — higher value than stage C's tail cells, so it runs FIRST);
# (2) second resumable pass of run_r5.sh for anything else unfinished;
# (3) hand the chip to the perf payload.
set -x
cd /root/repo || exit 1
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
LOG=/root/campaign_logs; OUT=/root/campaign_runs
if [ ! -f "$OUT/mcdropout-cifar-a_7_w_8-seed3/DONE" ]; then
  QBN_DIST_SPLIT=on python experiments/sweep.py quant --methods mcdropout \
    --tiers cifar --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra \
    --data /root/campaign_data > "$LOG/cifar_quant_mcdropout_a7w8_repair.log" 2>&1
  python tools/reaggregate.py "$OUT" > "$LOG/reagg_repair.log" 2>&1
  python tools/make_grid_plots.py "$OUT" --dataset cifar \
    --out "$OUT/figures/cifar" > "$LOG/figures_repair.log" 2>&1
fi
bash /root/repo/campaign/run_r5.sh
exec bash /root/repo/campaign/post_r5_perf.sh
