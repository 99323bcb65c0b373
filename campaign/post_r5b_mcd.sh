#!/bin/bash
# Waits for the chain-v4 queue to release the TPU, then runs the
# MC-Dropout INT stage-isolation microbench (tools/microbench_mcd.py) —
# the measurement that decides VERDICT r4 item 5: the conv-rule fix is
# proven to engage (tools/probe_mcd_path.py: every conv folds to S*B,
# full width) yet the suite cell still measures ~177 ms vs bbb 63 —
# this isolates dropout cost vs structure overhead vs the conv floor.
set -x
cd /root/repo || exit 1
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
# device may be wedged if the bisect ladder just faulted: probe first
for i in $(seq 1 60); do
  timeout 180 python - <<'EOF' && break
import jax, jax.numpy as jnp
print(float(jnp.ones(3).sum()))
EOF
  sleep 30
done
python tools/microbench_mcd.py > "$LOG/microbench_mcd_r5b.log" 2>&1
echo "MCD_MICROBENCH_DONE $(date)"
