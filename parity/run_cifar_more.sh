#!/bin/bash
# CIFAR-tier parity, remaining method families: mcdropout (quantised
# masked-multiply convs) and pointwise (deterministic baseline) on the
# SAME byte-identical learnable CIFAR pickles + SVHN OOD .mat as the
# bbb flagship cell (see refresh_after_loader_fix.sh for that driver).
# Budget mirrors the bbb cell: 12 float + 5 QAT epochs, 10 MC samples,
# batch 128, seed 1.
set -x
W=/tmp/parity
DATA=$W/cifar_data
cd /root/repo

for m in ${METHODS:-mcdropout pointwise}; do
  python parity/run_reference.py --method $m --phase float --tier cifar \
      --data $DATA --workdir $W/ref_cifar_$m --epochs 12 --samples 10 \
      --batch_size 128 > $W/ref_cifar_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_cifar_$m/not_q-cifar* | head -1)
  python parity/run_reference.py --method $m --phase qat --tier cifar \
      --data $DATA --workdir $W/ref_cifar_$m --epochs 5 --samples 10 \
      --batch_size 128 --load $REF > $W/ref_cifar_${m}_qat.log 2>&1

  python parity/run_ours.py --method $m --phase float --tier cifar \
      --data $DATA --workdir $W/ours_cifar_$m --epochs 12 --samples 10 \
      --batch_size 128 > $W/ours_cifar_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_cifar_$m/not_q-cifar* | head -1)
  python parity/run_ours.py --method $m --phase qat --tier cifar \
      --data $DATA --workdir $W/ours_cifar_$m --epochs 5 --samples 10 \
      --batch_size 128 --load $OURS > $W/ours_cifar_${m}_qat.log 2>&1
done
echo DONE_CIFAR_MORE
