#!/bin/bash
# Hard-task parity, seeds 2 and 3 (seed 1 = parity/run_hard.sh):
# quantifies single-seed trajectory variance on the non-saturated task.
set -x
DATA=/tmp/parity/data_hard
W=/tmp/parity
cd /root/repo
for s in 2 3; do
  for m in pointwise bbb; do
    python parity/run_reference.py --method $m --phase float --data $DATA \
        --workdir $W/ref_hard_${m}_s$s --epochs 20 --samples 10 --seed $s \
        > $W/ref_hard_${m}_s${s}_float.log 2>&1
    REF=$(ls -dt $W/ref_hard_${m}_s$s/not_q-mnist-classification-* | head -1)
    python parity/run_reference.py --method $m --phase qat --data $DATA \
        --workdir $W/ref_hard_${m}_s$s --epochs 10 --samples 10 --seed $s \
        --load $REF > $W/ref_hard_${m}_s${s}_qat.log 2>&1
    python parity/run_ours.py --method $m --phase float --data $DATA \
        --workdir $W/ours_hard_${m}_s$s --epochs 20 --samples 10 --seed $s \
        > $W/ours_hard_${m}_s${s}_float.log 2>&1
    OURS=$(ls -dt $W/ours_hard_${m}_s$s/not_q-mnist-classification-* | head -1)
    python parity/run_ours.py --method $m --phase qat --data $DATA \
        --workdir $W/ours_hard_${m}_s$s --epochs 10 --samples 10 --seed $s \
        --load $OURS > $W/ours_hard_${m}_s${s}_qat.log 2>&1
  done
done
echo DONE_HARD_SEEDS
