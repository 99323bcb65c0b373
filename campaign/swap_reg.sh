#!/bin/bash
# Stage-Q1 boundary swap for the regression queue: once the a7w8 stage
# marker appears (or the original queue exits), stop run_regression_cpu.sh
# at the next cell boundary and hand the CPU to the cell-major grid queue.
set -x
cd /root/repo || exit 1
LOG=${LOG:-/root/campaign_logs}
OUT=${OUT:-/root/campaign_runs}

while [ ! -f "$OUT/.stage_reg_a7w8_attempted" ] \
      && [ -d /root/campaign_reg.lock ]; do
  sleep 60
done

touch /root/campaign_stop_reg
while [ -d /root/campaign_reg.lock ]; do sleep 60; done
rm -f /root/campaign_stop_reg

bash campaign/run_reg_cells.sh > "$LOG/reg_cells_driver.log" 2>&1
echo "REG_SWAP_DONE $(date)"
