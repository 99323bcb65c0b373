#!/bin/bash
# Harder-task parity addendum: non-saturated clean-test error so the
# error/ECE comparison discriminates. Waits for the main suite.
set -x
while pgrep -f "parity/run_all.sh" > /dev/null; do sleep 60; done
DATA=/tmp/parity/data_hard
W=/tmp/parity
cd /root/repo
python parity/make_data.py --out $DATA --n_train 5000 --n_test 1000 \
    --noise_sigma 160 --max_shift 8

for m in pointwise bbb; do
  python parity/run_reference.py --method $m --phase float --data $DATA \
      --workdir $W/ref_hard_$m --epochs 20 --samples 10 \
      > $W/ref_hard_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_hard_$m/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method $m --phase qat --data $DATA \
      --workdir $W/ref_hard_$m --epochs 10 --samples 10 --load $REF \
      > $W/ref_hard_${m}_qat.log 2>&1
  python parity/run_ours.py --method $m --phase float --data $DATA \
      --workdir $W/ours_hard_$m --epochs 20 --samples 10 \
      > $W/ours_hard_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_hard_$m/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method $m --phase qat --data $DATA \
      --workdir $W/ours_hard_$m --epochs 10 --samples 10 --load $OURS \
      > $W/ours_hard_${m}_qat.log 2>&1
done
echo DONE_HARD
