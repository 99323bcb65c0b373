#!/bin/bash
# TPU work to run once the campaign + perf session queue drains.
# Editable until run_post_sgld.sh invokes it.
set -x
cd /root/repo
LOG=${LOG:-/root/campaign_logs}
python tools/microbench_draw_small.py > "$LOG/draw_small.log" 2>&1
echo "payload done $(date)"
