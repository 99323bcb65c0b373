#!/bin/bash
# TPU work to run once the campaign + perf session queue drains.
# Editable until run_post_sgld.sh invokes it.
set -x
cd /root/repo
LOG=${LOG:-/root/campaign_logs}
python tools/microbench_draw_small.py > "$LOG/draw_small.log" 2>&1
# headline A/B of the draw-layout default: round-2 measured flat faster,
# the round-3 microbench reverses it (both ~0.5 ms apart on a 60+ ms
# program) — decide the default on the end-to-end number
QBN_DRAW_FLAT=off python bench.py > "$LOG/bench_natural.log" 2>&1
QBN_DRAW_FLAT=off python bench.py >> "$LOG/bench_natural.log" 2>&1
python bench.py > "$LOG/bench_flat.log" 2>&1
echo "payload done $(date)"
