#!/bin/bash
# Round-4 perf-refresh tail: re-run the two benches whose first-pass
# numbers were invalidated by loop-invariant hoisting (commit 1a19d6d —
# deterministic INT cells / frozen-bank artifacts ignore their seed, so
# XLA hoisted the forward out of the timing loop). Waits for run_r4d.sh
# to release the TPU lock, then takes it. Hard stop: no bench starts
# after /root/campaign_cutoff_perf (epoch s).
set -x
cd /root/repo || exit 1
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"

cutoff() {
  if [ -f /root/campaign_cutoff_perf ]; then cat /root/campaign_cutoff_perf;
  else date -d "+1 hour" +%s; fi
}
fits() { [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]; }

# only the first-pass cells invalidated by hoisting need re-measuring
# (bbb / mcdropout / lenet / serving-b1 consumed their seed and stand)
fits 700 && python tools/bench_suite.py \
  --only pointwise,ensemble7,mlp_bbb > "$LOG/suite_r4e.log" 2>&1
fits 800 && python tools/bench_serving.py \
  --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
  > "$LOG/serving_freeze_r4e.log" 2>&1
fits 500 && python bench.py > "$LOG/bench_r4e.log" 2>&1
echo "R4E_QUEUE_DONE $(date)"
