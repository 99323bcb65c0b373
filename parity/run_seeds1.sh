#!/bin/bash
# Seed-1 rerun of the SGHMC-ensemble and mcdropout mnist parity cells
# (same budgets as parity/run_sgld.sh / run_all.sh) into seed-suffixed
# dirs so parity/aggregate_seeds.py can pool seeds 1-3 with the
# run_seeds_more.sh output. Needed because the round-2 seed-1 run dirs
# lived in /tmp and did not survive a host restart.
set -x
DATA=/tmp/parity/data
W=/tmp/parity
cd /root/repo
# default 10000/2000 — the SAME bytes run_seeds_more.sh used for seeds
# 2-3 (both stacks share bytes per seed, so the comparison is valid;
# note this is LARGER than the round-2 seed-1 run_all.sh data, which is
# why seed 1 is rerun here rather than pooled from the old tables)
[ -f $DATA/MNIST/raw/train-images-idx3-ubyte ] || \
  python parity/make_data.py --out $DATA

s=1
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
echo DONE_SEEDS1
