#!/bin/bash
# Rerun the ours-side hard-task cells (seeds 1-3) after the loader
# drop_last/n_points fix; reference-side runs are already on disk.
set -x
DATA=/tmp/parity/data_hard
W=/tmp/parity
cd /root/repo
for s in 1 2 3; do
  sfx=""
  [ "$s" != "1" ] && sfx="_s$s"
  for m in pointwise bbb; do
    rm -rf $W/ours_hard_${m}${sfx}
    python parity/run_ours.py --method $m --phase float --data $DATA \
        --workdir $W/ours_hard_${m}${sfx} --epochs 20 --samples 10 \
        --seed $s > $W/ours_hard_${m}${sfx}_float.log 2>&1
    OURS=$(ls -dt $W/ours_hard_${m}${sfx}/not_q-mnist-classification-* | head -1)
    python parity/run_ours.py --method $m --phase qat --data $DATA \
        --workdir $W/ours_hard_${m}${sfx} --epochs 10 --samples 10 \
        --seed $s --load $OURS > $W/ours_hard_${m}${sfx}_qat.log 2>&1
  done
done
echo DONE_RERUN_HARD_OURS
