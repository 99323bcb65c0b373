#!/bin/bash
# Regression-tier parity protocol: synthetic + byte-identical UCI tables
# (housing, yacht) through both stacks, float + QAT->convert->INT.
# Reference full budget: 300 float epochs, 10 QAT, 3 folds per UCI dataset.
set -x
DATA=/tmp/parity/data
W=/tmp/parity
DS="synthetic:1,housing:3,yacht:3"
cd /root/repo

python parity/make_uci.py --out $DATA

for m in pointwise bbb; do
  python parity/run_reference.py --method $m --phase float --tier regression \
      --datasets $DS --data $DATA --workdir $W/ref_regr_$m --epochs 300 \
      --samples 10 > $W/ref_regr_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_regr_$m/not_q-regression* | head -1)
  python parity/run_reference.py --method $m --phase qat --tier regression \
      --datasets $DS --data $DATA --workdir $W/ref_regr_$m --epochs 10 \
      --samples 10 --load $REF > $W/ref_regr_${m}_qat.log 2>&1

  python parity/run_ours.py --method $m --phase float --tier regression \
      --datasets $DS --data $DATA --workdir $W/ours_regr_$m --epochs 300 \
      --samples 10 > $W/ours_regr_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_regr_$m/not_q-regression* | head -1)
  python parity/run_ours.py --method $m --phase qat --tier regression \
      --datasets $DS --data $DATA --workdir $W/ours_regr_$m --epochs 10 \
      --samples 10 --load $OURS > $W/ours_regr_${m}_qat.log 2>&1
done
echo DONE_REGR
