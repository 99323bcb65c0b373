#!/bin/bash
# SGHMC float-cell seed extension (seeds 4-6, both stacks, same bytes):
# the 3-seed table shows one of OUR chains hopping to a worse mode at
# burn-in end (seed 3, test error 0 -> 0.0995) while the reference's 3
# chains stayed clean. Per-step lockstep equality and identical
# resample/burn-in/clip schedules are already pinned
# (tests/test_lockstep_torch.py; docs/PARITY.md) — this measures the
# chain-level mode-hop RATE with enough seeds to tell 'hotter chain'
# from coin flips. Float phase only (the mode hop happens in float).
set -x
DATA=/tmp/parity/data
W=/tmp/parity
cd /root/repo
for s in 4 5 6; do
  python parity/run_reference.py --method sgld --phase float --data $DATA \
      --workdir $W/ref_sgld_s$s --epochs 26 --samples 8 --seed $s \
      --extra --burnin_epochs 8 > $W/ref_sgld_s${s}_float.log 2>&1
  python parity/run_ours.py --method sgld --phase float --data $DATA \
      --workdir $W/ours_sgld_s$s --epochs 26 --samples 8 --seed $s \
      --extra --burnin_epochs 8 > $W/ours_sgld_s${s}_float.log 2>&1
done
echo DONE_SGLD_SEEDS46
