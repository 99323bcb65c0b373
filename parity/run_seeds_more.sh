#!/bin/bash
# Multi-seed reruns for the two unexplained single-seed parity deltas
# (VERDICT r2 #4): the SGHMC ensemble OOD-entropy cell (-0.08 at seed 1)
# and the mcdropout INT8 OOD-NLL cell (+0.79 at seed 1), seeds 2-3 both
# stacks at the same reduced budgets as parity/run_sgld.sh / run_all.sh.
# Waits for a marker file (NOT pgrep -f: our own command line matches).
set -x
DATA=/tmp/parity/data
W=/tmp/parity
WAIT_FILE=${WAIT_FILE:-}
if [ -n "$WAIT_FILE" ]; then
  until grep -q DONE "$WAIT_FILE" 2>/dev/null; do sleep 60; done
fi
cd /root/repo
[ -f $DATA/MNIST/raw/train-images-idx3-ubyte ] || \
  python parity/make_data.py --out $DATA

for s in 2 3; do
  python parity/run_reference.py --method sgld --phase float --data $DATA \
      --workdir $W/ref_sgld_s$s --epochs 26 --samples 8 --seed $s \
      --extra --burnin_epochs 8 > $W/ref_sgld_s${s}_float.log 2>&1
  REF=$(ls -dt $W/ref_sgld_s$s/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method sgld --phase qat --data $DATA \
      --workdir $W/ref_sgld_s$s --epochs 5 --samples 8 --seed $s \
      --load $REF > $W/ref_sgld_s${s}_qat.log 2>&1
  python parity/run_ours.py --method sgld --phase float --data $DATA \
      --workdir $W/ours_sgld_s$s --epochs 26 --samples 8 --seed $s \
      --extra --burnin_epochs 8 > $W/ours_sgld_s${s}_float.log 2>&1
  OURS=$(ls -dt $W/ours_sgld_s$s/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method sgld --phase qat --data $DATA \
      --workdir $W/ours_sgld_s$s --epochs 5 --samples 8 --seed $s \
      --load $OURS --extra --burnin_epochs 8 \
      > $W/ours_sgld_s${s}_qat.log 2>&1

  python parity/run_reference.py --method mcdropout --phase float \
      --data $DATA --workdir $W/ref_mcd_s$s --epochs 20 --samples 10 \
      --seed $s > $W/ref_mcd_s${s}_float.log 2>&1
  REF=$(ls -dt $W/ref_mcd_s$s/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method mcdropout --phase qat \
      --data $DATA --workdir $W/ref_mcd_s$s --epochs 10 --samples 10 \
      --seed $s --load $REF > $W/ref_mcd_s${s}_qat.log 2>&1
  python parity/run_ours.py --method mcdropout --phase float --data $DATA \
      --workdir $W/ours_mcd_s$s --epochs 20 --samples 10 --seed $s \
      > $W/ours_mcd_s${s}_float.log 2>&1
  OURS=$(ls -dt $W/ours_mcd_s$s/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method mcdropout --phase qat --data $DATA \
      --workdir $W/ours_mcd_s$s --epochs 10 --samples 10 --seed $s \
      --load $OURS > $W/ours_mcd_s${s}_qat.log 2>&1
done
echo DONE_SEEDS_MORE
