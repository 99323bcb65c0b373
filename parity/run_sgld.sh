#!/bin/bash
# SGHMC parity cell (reduced budget: 26 epochs, burn-in 8 -> 8 posterior
# snapshots = --samples 8). Waits for the hard-task addendum.
set -x
while pgrep -f "parity/run_hard.sh" > /dev/null; do sleep 60; done
DATA=/tmp/parity/data
W=/tmp/parity
cd /root/repo
python parity/run_reference.py --method sgld --phase float --data $DATA \
    --workdir $W/ref_sgld --epochs 26 --samples 8 \
    --extra --burnin_epochs 8 > $W/ref_sgld_float.log 2>&1
REF=$(ls -dt $W/ref_sgld/not_q-mnist-classification-* | head -1)
python parity/run_reference.py --method sgld --phase qat --data $DATA \
    --workdir $W/ref_sgld --epochs 5 --samples 8 --load $REF \
    > $W/ref_sgld_qat.log 2>&1
python parity/run_ours.py --method sgld --phase float --data $DATA \
    --workdir $W/ours_sgld --epochs 26 --samples 8 \
    --extra --burnin_epochs 8 > $W/ours_sgld_float.log 2>&1
OURS=$(ls -dt $W/ours_sgld/not_q-mnist-classification-* | head -1)
python parity/run_ours.py --method sgld --phase qat --data $DATA \
    --workdir $W/ours_sgld --epochs 5 --samples 8 --load $OURS \
    --extra --burnin_epochs 8 > $W/ours_sgld_qat.log 2>&1
echo DONE_SGLD
