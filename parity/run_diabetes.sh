#!/bin/bash
# REAL-data regression parity: sklearn's bundled diabetes study (442 real
# patients, 10 raw physiological features) as byte-identical whitespace
# tables through BOTH stacks (the unmodified torch reference reads it via
# its housing slot), float + QAT->convert->INT8, 3 folds at the
# reference's own budget (300 float / 10 QAT epochs).
# NOTE: serialise with any other TPU job (one TPU process at a time).
set -x
DATA=/tmp/parity/data_diabetes
W=/tmp/parity
DS="synthetic:1,housing:3"
cd /root/repo

python parity/make_diabetes.py --out $DATA

for m in bbb mcdropout; do
  python parity/run_reference.py --method $m --phase float --tier regression \
      --datasets $DS --data $DATA --workdir $W/ref_diab_$m --epochs 300 \
      --samples 10 > $W/ref_diab_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_diab_$m/not_q-regression* | head -1)
  python parity/run_reference.py --method $m --phase qat --tier regression \
      --datasets $DS --data $DATA --workdir $W/ref_diab_$m --epochs 10 \
      --samples 10 --load $REF > $W/ref_diab_${m}_qat.log 2>&1

  python parity/run_ours.py --method $m --phase float --tier regression \
      --datasets $DS --data $DATA --workdir $W/ours_diab_$m --epochs 300 \
      --samples 10 > $W/ours_diab_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_diab_$m/not_q-regression* | head -1)
  python parity/run_ours.py --method $m --phase qat --tier regression \
      --datasets $DS --data $DATA --workdir $W/ours_diab_$m --epochs 10 \
      --samples 10 --load $OURS > $W/ours_diab_${m}_qat.log 2>&1
done
echo DONE_DIABETES
