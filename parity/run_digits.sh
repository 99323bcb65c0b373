#!/bin/bash
# REAL-data parity cell: sklearn digits (real scanned images, shared
# bytes) through the full float -> QAT -> convert -> INT8 pipeline on
# both stacks. Same protocol as run_all.sh.
#
# Batch size 64 (not the MNIST scripts' 256): the real-digits set has
# 1293 train images after the valid split, so batch 256 gives ~5
# steps/epoch — 300 total steps at 60 epochs, and a ~40x stronger
# per-batch KL weight than real 60k-image MNIST ('batch' loss scaling
# divides the KL by the number of batches). Measured: at batch 256 the
# REFERENCE BBB itself pins at 0.93 train error (KL-dominated,
# never leaves the prior). Batch 64 restores a sane step count and KL
# weight for BOTH stacks; all other hyperparameters are the scripts'
# own defaults.
set -x
DATA=/tmp/parity_digits/data
W=/tmp/parity_digits
EPOCHS_FLOAT=${EPOCHS_FLOAT:-60}
EPOCHS_QAT=${EPOCHS_QAT:-10}
BATCH=${BATCH:-64}
cd /root/repo

python parity/make_digits.py --out $DATA

for m in ${METHODS:-pointwise bbb mcdropout}; do
  python parity/run_reference.py --method $m --phase float --data $DATA \
      --workdir $W/ref_$m --epochs $EPOCHS_FLOAT --samples 10 \
      --batch_size $BATCH > $W/ref_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_$m/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method $m --phase qat --data $DATA \
      --workdir $W/ref_$m --epochs $EPOCHS_QAT --samples 10 \
      --batch_size $BATCH --load $REF > $W/ref_${m}_qat.log 2>&1

  python parity/run_ours.py --method $m --phase float --data $DATA \
      --workdir $W/ours_$m --epochs $EPOCHS_FLOAT --samples 10 \
      --batch_size $BATCH > $W/ours_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_$m/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method $m --phase qat --data $DATA \
      --workdir $W/ours_$m --epochs $EPOCHS_QAT --samples 10 \
      --batch_size $BATCH --load $OURS > $W/ours_${m}_qat.log 2>&1
done
echo DONE_DIGITS
