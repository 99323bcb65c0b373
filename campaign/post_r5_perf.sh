#!/bin/bash
# Round-5 post-campaign TPU payload: perf validation of the round's
# MC-Dropout conv-rule fix + serving re-measure under the RTT fix, then
# the distortion-fault bisect ladder (VERDICT r4 items 3 and 5).
#
# Launch AFTER campaign/run_r5.sh releases /root/campaign_tpu.lock (this
# script waits for it). The bisect ladder runs LAST because a fault
# wedges the device 10-30 min: every rung is gated on the cutoff file
# /root/campaign_cutoff_perf (epoch secs) with a recovery probe loop
# between rungs, and the ladder STOPS at the first reproduced fault —
# one clean repro is the deliverable, not a full matrix.
set -x
cd /root/repo || exit 1
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"

cutoff() {
  if [ -f /root/campaign_cutoff_perf ]; then cat /root/campaign_cutoff_perf;
  else date -d "+90 minutes" +%s; fi
}
fits() { [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]; }

probe_recover() {
  # single-process probe loop until the device answers (CLAUDE.md:
  # never probe with a second process while one is blocked)
  for i in $(seq 1 60); do
    timeout 120 python - <<'EOF' && return 0
import jax, jax.numpy as jnp
print(float(jnp.ones(3).sum()))
EOF
    sleep 30
  done
  return 1
}

# ---- 1. per-method suite: mcdropout (the fix target) + bbb (control)
fits 2400 && \
python tools/bench_suite.py --only resnet_mcdropout,resnet_bbb \
  > "$LOG/suite_r5_mcd.log" 2>&1

# ---- 2. headline bench (trained ckpt default)
fits 1200 && python bench.py > "$LOG/bench_r5_post.log" 2>&1

# ---- 3. serving bench re-measure under the RTT-floor fix (ADVICE r4)
fits 2400 && \
python tools/bench_serving.py \
  --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
  > "$LOG/serving_r5.log" 2>&1

# ---- 4. distortion-fault bisect ladder (STOPS at first fault)
CKPT=/root/campaign_runs/mcdropout-cifar-seed1/weights.msgpack
rung() {  # rung <label> <args...>
  local label=$1; shift
  fits 1800 || return 1
  if python tools/repro_dist_fault.py "$@" \
      > "$LOG/repro_${label}.log" 2>&1; then
    echo "RUNG_OK $label" >> "$LOG/repro_ladder.log"
    return 0
  fi
  echo "RUNG_FAULT $label (exit $?)" >> "$LOG/repro_ladder.log"
  probe_recover
  echo "RECOVERED after $label" >> "$LOG/repro_ladder.log"
  return 2
}
: > "$LOG/repro_ladder.log"
# rung 1: the full crashing configuration, synthetic weights
FAULT_ARGS=""
rung full_synth --cells 15 --batches 39 --samples 20; r=$?
if [ "$r" = 0 ] && [ -f "$CKPT" ]; then
  # synthetic survived: trained-checkpoint values next
  rung full_ckpt --cells 15 --batches 39 --samples 20 --ckpt "$CKPT"; r=$?
  [ "$r" = 2 ] && FAULT_ARGS="--ckpt $CKPT"
fi
if [ "$r" = 2 ]; then
  # reproduced: bisect the outer scan length on the faulting variant
  rung half_cells --cells 8 --batches 39 --samples 20 $FAULT_ARGS
  [ $? = 2 ] && rung quarter_cells --cells 4 --batches 39 --samples 20 \
    $FAULT_ARGS
  # control: same program shape, no dropout masks
  rung control_pointwise --cells 15 --batches 39 --samples 1 \
    --method pointwise
fi
echo "R5_PERF_DONE $(date)"
