#!/bin/bash
# Refresh every ours-side parity cell after the DataLoader tail-semantics
# fix (drop_last=False + pre-split n_points): the fix changes the
# training stream, so the committed tables must be regenerated from
# post-fix runs. Reference-side dirs are reused where intact; the
# mnist-tier bbb/mcdropout reference dirs were lost and are rerun.
# Single-core host: strictly sequential. Waits for rerun_hard_ours.sh.
set -x
W=/tmp/parity
WD=/tmp/parity_digits
cd /root/repo

while kill -0 $(cat /tmp/rerun_hard.pid 2>/dev/null) 2>/dev/null; do
  sleep 60
done

# ---- 1. mnist main tier (ref bbb/mcdropout lost -> rerun both sides)
for m in bbb mcdropout; do
  rm -rf $W/ref_$m
  python parity/run_reference.py --method $m --phase float --data $W/data \
      --workdir $W/ref_$m --epochs 20 --samples 10 \
      > $W/ref_${m}_float.log 2>&1
  REF=$(ls -dt $W/ref_$m/not_q-mnist-classification-* | head -1)
  python parity/run_reference.py --method $m --phase qat --data $W/data \
      --workdir $W/ref_$m --epochs 10 --samples 10 --load $REF \
      > $W/ref_${m}_qat.log 2>&1
done
for m in pointwise bbb mcdropout; do
  rm -rf $W/ours_$m
  python parity/run_ours.py --method $m --phase float --data $W/data \
      --workdir $W/ours_$m --epochs 20 --samples 10 \
      > $W/ours_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_$m/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method $m --phase qat --data $W/data \
      --workdir $W/ours_$m --epochs 10 --samples 10 --load $OURS \
      > $W/ours_${m}_qat.log 2>&1
done
echo STAGE_MNIST_DONE

# ---- 2. sgld (SGHMC) mnist cell, ours side
rm -rf $W/ours_sgld
python parity/run_ours.py --method sgld --phase float --data $W/data \
    --workdir $W/ours_sgld --epochs 26 --samples 8 --extra --burnin_epochs 8 \
    > $W/ours_sgld_float.log 2>&1
OURS=$(ls -dt $W/ours_sgld/not_q-mnist-classification-* | head -1)
python parity/run_ours.py --method sgld --phase qat --data $W/data \
    --workdir $W/ours_sgld --epochs 5 --samples 8 --load $OURS \
    --extra --burnin_epochs 8 > $W/ours_sgld_qat.log 2>&1
echo STAGE_SGLD_DONE

# ---- 3. REAL digits tier, ours side (ref dirs intact)
for m in pointwise bbb mcdropout; do
  rm -rf $WD/ours_$m
  python parity/run_ours.py --method $m --phase float --data $WD/data \
      --workdir $WD/ours_$m --epochs 60 --samples 10 --batch_size 64 \
      > $WD/ours_${m}_float.log 2>&1
  OURS=$(ls -dt $WD/ours_$m/not_q-mnist-classification-* | head -1)
  python parity/run_ours.py --method $m --phase qat --data $WD/data \
      --workdir $WD/ours_$m --epochs 10 --samples 10 --batch_size 64 \
      --load $OURS > $WD/ours_${m}_qat.log 2>&1
done
echo STAGE_DIGITS_DONE

# ---- 4. regression tier, ours side (pointwise/bbb @300, mcd/sgld @100)
DS="synthetic:1,housing:3,yacht:3"
for m in pointwise bbb; do
  rm -rf $W/ours_regr_$m
  python parity/run_ours.py --method $m --phase float --tier regression \
      --datasets $DS --data $W/data --workdir $W/ours_regr_$m --epochs 300 \
      --samples 10 > $W/ours_regr_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_regr_$m/not_q-regression* | head -1)
  python parity/run_ours.py --method $m --phase qat --tier regression \
      --datasets $DS --data $W/data --workdir $W/ours_regr_$m --epochs 10 \
      --samples 10 --load $OURS > $W/ours_regr_${m}_qat.log 2>&1
done
rm -rf $W/ours_regr_mcdropout
python parity/run_ours.py --method mcdropout --phase float \
    --tier regression --datasets $DS --data $W/data \
    --workdir $W/ours_regr_mcdropout --epochs 100 --samples 8 \
    > $W/ours_regr_mcdropout_float.log 2>&1
OURS=$(ls -dt $W/ours_regr_mcdropout/not_q-regression* | head -1)
python parity/run_ours.py --method mcdropout --phase qat \
    --tier regression --datasets $DS --data $W/data \
    --workdir $W/ours_regr_mcdropout --epochs 10 --samples 8 \
    --load $OURS > $W/ours_regr_mcdropout_qat.log 2>&1
for s in 1 2 3; do
  sfx=""; [ "$s" != "1" ] && sfx="_s$s"
  rm -rf $W/ours_regr_sgld$sfx
  python parity/run_ours.py --method sgld --phase float --tier regression \
      --datasets $DS --data $W/data --workdir $W/ours_regr_sgld$sfx \
      --epochs 100 --samples 8 --seed $s --extra --burnin_epochs 30 \
      > $W/ours_regr_sgld${sfx}_float.log 2>&1
  OURS=$(ls -dt $W/ours_regr_sgld$sfx/not_q-regression* | head -1)
  python parity/run_ours.py --method sgld --phase qat --tier regression \
      --datasets $DS --data $W/data --workdir $W/ours_regr_sgld$sfx \
      --epochs 10 --samples 8 --seed $s --load $OURS --extra --burnin_epochs 30 \
      > $W/ours_regr_sgld${sfx}_qat.log 2>&1
done
echo STAGE_REGR_DONE

# ---- 5. REAL diabetes tier, ours side
DSD="synthetic:1,housing:3"
for m in bbb mcdropout; do
  rm -rf $W/ours_diab_$m
  python parity/run_ours.py --method $m --phase float --tier regression \
      --datasets $DSD --data $W/data_diabetes --workdir $W/ours_diab_$m \
      --epochs 300 --samples 10 > $W/ours_diab_${m}_float.log 2>&1
  OURS=$(ls -dt $W/ours_diab_$m/not_q-regression* | head -1)
  python parity/run_ours.py --method $m --phase qat --tier regression \
      --datasets $DSD --data $W/data_diabetes --workdir $W/ours_diab_$m \
      --epochs 10 --samples 10 --load $OURS \
      > $W/ours_diab_${m}_qat.log 2>&1
done
echo STAGE_DIABETES_DONE

# ---- 6. CIFAR tier, ours side (BBB ResNet-18 w24; the long one)
rm -rf $W/ours_cifar_bbb
python parity/run_ours.py --method bbb --phase float --tier cifar \
    --data $W/cifar_data --workdir $W/ours_cifar_bbb --epochs 12 \
    --samples 10 --batch_size 128 > $W/ours_cifar_bbb_float.log 2>&1
OURS=$(ls -dt $W/ours_cifar_bbb/not_q-cifar* | head -1)
python parity/run_ours.py --method bbb --phase qat --tier cifar \
    --data $W/cifar_data --workdir $W/ours_cifar_bbb --epochs 5 \
    --samples 10 --batch_size 128 --load $OURS \
    > $W/ours_cifar_bbb_qat.log 2>&1
echo STAGE_CIFAR_DONE
echo DONE_REFRESH_ALL
