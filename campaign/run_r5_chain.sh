#!/bin/bash
# Round-5 chain v3: after the primary TPU queue exits —
#  (1) repair the mcdropout-cifar a_7_w_8 cell a transient relay failure
#      killed at 06:10 UTC (the PRIMARY INT8 cell);
#  (2) re-run the sgld-cifar a_7_w_4 cell under the FIXED trainer: its
#      first run collapsed to NaN in all 3 seeds because the NaN-step
#      skip did not cover the mutable BN/observer stats (one overflowing
#      batch poisoned a member permanently — bug found and fixed this
#      round, tests/test_training.py::test_nan_step_skip_covers_mutable_stats);
#  (3) second resumable pass of run_r5.sh for anything else unfinished;
#  (4) hand the chip to the perf payload.
set -x
cd /root/repo || exit 1
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
LOG=/root/campaign_logs; OUT=/root/campaign_runs
if [ ! -f "$OUT/mcdropout-cifar-a_7_w_8-seed3/DONE" ]; then
  QBN_DIST_SPLIT=on python experiments/sweep.py quant --methods mcdropout \
    --tiers cifar --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra \
    --data /root/campaign_data > "$LOG/cifar_quant_mcdropout_a7w8_repair.log" 2>&1
fi
if grep -q nan "$OUT/sgld-cifar-a_7_w_4-seed1/results.json" 2>/dev/null; then
  rm -rf "$OUT"/sgld-cifar-a_7_w_4-seed[123] "$OUT"/sgld-cifar-a_7_w_4-avg
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_4 --out "$OUT" --extra \
    --data /root/campaign_data > "$LOG/cifar_quant_sgld_a7w4_rerun.log" 2>&1
fi
python tools/reaggregate.py "$OUT" > "$LOG/reagg_chain.log" 2>&1
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_chain.log" 2>&1
bash /root/repo/campaign/run_r5.sh
exec bash /root/repo/campaign/post_r5_perf.sh
