#!/bin/bash
# Stage-2 boundary swap (planned in run_r4b.sh's header): once the LAST
# sgld-mnist quant cell (a_3_w_8) has started, stop run_r4.sh at the next
# cell boundary and hand the TPU to the floats-first CIFAR queue
# (run_r4b.sh). If run_r4.sh exits on its own first (crash or cutoff),
# launch r4b immediately — the DONE markers make the handoff idempotent.
set -x
cd /root/repo || exit 1
LOG=${LOG:-/root/campaign_logs}

# wait for the last stage-2 cell to START (its log appears at launch),
# or for run_r4.sh to be gone entirely
while [ ! -f "$LOG/mnist_quant_sgld_a_3_w_8.log" ] \
      && [ -d /root/campaign_tpu.lock ]; do
  sleep 60
done

touch /root/campaign_stop
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
rm -f /root/campaign_stop

bash campaign/run_r4b.sh > "$LOG/r4b_driver.log" 2>&1
echo "SWAP_DONE $(date)"
