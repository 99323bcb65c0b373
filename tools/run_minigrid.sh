#!/bin/bash
# Miniature full grid (VERDICT #8): 2 methods x mnist x 2 seeds x 3
# precision cells at micro budget, through sweep.py -> average_results ->
# presentation. Uses the parity dataset (real idx files). Waits for the
# sgld parity cell.
set -x
while pgrep -f "parity/run_sgld.sh" > /dev/null; do sleep 60; done
cd /root/repo
OUT=/tmp/minigrid
python experiments/sweep.py float --methods pointwise bbb --tiers mnist \
    --seeds 1 2 --out $OUT \
    --extra --epochs 4 --samples 4 --data /tmp/parity/data \
    > /tmp/minigrid_float.log 2>&1
python experiments/sweep.py quant --methods pointwise bbb --tiers mnist \
    --seeds 1 2 --cells a_7_w_8 a_7_w_4 a_4_w_8 --out $OUT \
    --extra --epochs 2 --samples 4 --data /tmp/parity/data \
    > /tmp/minigrid_quant.log 2>&1
python tools/minigrid_plots.py --sweeps $OUT --out examples/minigrid \
    > /tmp/minigrid_plots.log 2>&1
echo DONE_MINIGRID
