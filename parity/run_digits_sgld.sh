#!/bin/bash
# REAL-data SGHMC-ensemble parity cell: sklearn digits (real scanned
# images, byte-identical on disk for both stacks) through the full
# float -> QAT(per-snapshot) -> convert -> INT8 pipeline.
#
# Completes the 4th method family on the real-digits protocol
# (run_digits.sh covers pointwise/bbb/mcdropout). Budget mirrors
# run_digits.sh (batch 64 — see the KL/step-count note there) with the
# SGHMC schedule scaled to it: 60 float epochs, burn-in 20, snapshots
# every 2nd epoch over the last samples*2 epochs (reference rule,
# /root/reference/src/trainer.py:75-79) -> --samples 10 uses epochs
# 40..60. QAT retrains each of the 10 snapshots for 10 epochs (the
# reference's own per-member retrain loop,
# experiments/scripts/stochastic/sgld/quantised/train/sgld_mnist.py).
set -x
DATA=/tmp/parity_digits/data
W=/tmp/parity_digits
EPOCHS_FLOAT=${EPOCHS_FLOAT:-60}
EPOCHS_QAT=${EPOCHS_QAT:-10}
BATCH=${BATCH:-64}
SAMPLES=${SAMPLES:-10}
BURNIN=${BURNIN:-20}
cd /root/repo

[ -d $DATA ] || python parity/make_digits.py --out $DATA

python parity/run_reference.py --method sgld --phase float --data $DATA \
    --workdir $W/ref_sgld --epochs $EPOCHS_FLOAT --samples $SAMPLES \
    --batch_size $BATCH --extra --burnin_epochs $BURNIN \
    > $W/ref_sgld_float.log 2>&1
REF=$(ls -dt $W/ref_sgld/not_q-mnist-classification-* | head -1)
python parity/run_reference.py --method sgld --phase qat --data $DATA \
    --workdir $W/ref_sgld --epochs $EPOCHS_QAT --samples $SAMPLES \
    --batch_size $BATCH --load $REF > $W/ref_sgld_qat.log 2>&1

python parity/run_ours.py --method sgld --phase float --data $DATA \
    --workdir $W/ours_sgld --epochs $EPOCHS_FLOAT --samples $SAMPLES \
    --batch_size $BATCH --extra --burnin_epochs $BURNIN \
    > $W/ours_sgld_float.log 2>&1
OURS=$(ls -dt $W/ours_sgld/not_q-mnist-classification-* | head -1)
python parity/run_ours.py --method sgld --phase qat --data $DATA \
    --workdir $W/ours_sgld --epochs $EPOCHS_QAT --samples $SAMPLES \
    --batch_size $BATCH --load $OURS --extra --burnin_epochs $BURNIN \
    > $W/ours_sgld_qat.log 2>&1
echo DONE_DIGITS_SGLD
