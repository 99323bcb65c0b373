#!/bin/bash
# Real-digits parity, extra seeds (seed 1 = parity/run_digits.sh):
# turns the single-seed OOD deltas (the most seed-sensitive statistic
# of the 1.3k-image protocol — see docs/PARITY.md digits notes) into
# cross-seed mean±std evidence, mirroring run_hard_seeds.sh.
set -x
DATA=/tmp/parity_digits/data
W=/tmp/parity_digits
BATCH=${BATCH:-64}
cd /root/repo
for s in ${SEEDS:-2 3}; do
  for m in ${METHODS:-bbb}; do
    python parity/run_reference.py --method $m --phase float --data $DATA \
        --workdir $W/ref_${m}_s$s --epochs 60 --samples 10 --seed $s \
        --batch_size $BATCH > $W/ref_${m}_s${s}_float.log 2>&1
    REF=$(ls -dt $W/ref_${m}_s$s/not_q-mnist-classification-* | head -1)
    python parity/run_reference.py --method $m --phase qat --data $DATA \
        --workdir $W/ref_${m}_s$s --epochs 10 --samples 10 --seed $s \
        --batch_size $BATCH --load $REF > $W/ref_${m}_s${s}_qat.log 2>&1
    python parity/run_ours.py --method $m --phase float --data $DATA \
        --workdir $W/ours_${m}_s$s --epochs 60 --samples 10 --seed $s \
        --batch_size $BATCH > $W/ours_${m}_s${s}_float.log 2>&1
    OURS=$(ls -dt $W/ours_${m}_s$s/not_q-mnist-classification-* | head -1)
    python parity/run_ours.py --method $m --phase qat --data $DATA \
        --workdir $W/ours_${m}_s$s --epochs 10 --samples 10 --seed $s \
        --batch_size $BATCH --load $OURS > $W/ours_${m}_s${s}_qat.log 2>&1
  done
done
echo DONE_DIGITS_SEEDS
