#!/bin/bash
# Full parity protocol: reference (torch/CPU) + qbn_tpu on the shared
# synthetic MNIST dataset. Single-core host: everything sequential.
set -x
DATA=/tmp/parity/data
W=/tmp/parity
cd /root/repo

python parity/make_data.py --out $DATA --n_train 5000 --n_test 1000

for m in pointwise bbb mcdropout; do
  python parity/run_reference.py --method $m --phase float --data $DATA \
      --workdir $W/ref_$m --epochs 20 --samples 10 \
      > $W/ref_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_$m/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method $m --phase qat --data $DATA \
      --workdir $W/ref_$m --epochs 10 --samples 10 --load $REF \
      > $W/ref_${m}_qat.log 2>&1

  python parity/run_ours.py --method $m --phase float --data $DATA \
      --workdir $W/ours_$m --epochs 20 --samples 10 \
      > $W/ours_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_$m/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method $m --phase qat --data $DATA \
      --workdir $W/ours_$m --epochs 10 --samples 10 --load $OURS \
      > $W/ours_${m}_qat.log 2>&1
done
echo DONE_ALL
