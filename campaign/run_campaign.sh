#!/bin/bash
# Reference-budget experiment campaign (round-3 VERDICT items #1/#2).
#
# Reproduces the reference's actual experiment product at its own budgets
# (reference: experiments/run_all_float.sh:6-44, run_all_quant.sh:11-61,
# presentation/plot_locally.sh:2-31) on the learnable synthetic
# reference-scale dataset (campaign/make_campaign_data.py):
#   - CIFAR tier (flagship BBB): 300-epoch float x 3 seeds, then the full
#     quant grid (w in {3..8} @ a7, a in {3..6} @ w8) x 3 seeds with
#     10-epoch QAT fine-tunes + true-INT evaluation.
#   - MNIST tier: all 4 methods, 100-epoch float x 3 seeds + full quant
#     grid x 3 seeds.
# Each stage runs once (marker files make the script resumable); one TPU
# process at a time (CLAUDE.md environment hazards).
set -u
cd /root/repo
DATA=${DATA:-/root/campaign_data}
OUT=${OUT:-/root/campaign_runs}
LOG=${LOG:-/root/campaign_logs}
mkdir -p "$OUT" "$LOG"
# NOTE: jax's persistent compilation cache cannot help here — the axon
# PJRT backend reports an unsupported platform (cache stays disabled) and
# force-enabling it hangs in executable serialization (measured 2026-08-19).
# Compile amortisation comes from sweep.py running all seeds of a cell in
# one process instead.

stage() {
  local name=$1; shift
  if [ -f "$OUT/.done_$name" ]; then echo "skip $name"; return 0; fi
  echo "=== stage $name start $(date)"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$OUT/.done_$name"; fi
  echo "=== stage $name exit $rc $(date)"
  return 0
}

stage cifar_bbb_float python experiments/sweep.py float \
  --methods bbb --tiers cifar --seeds 1 2 3 --out "$OUT" \
  --extra --data "$DATA"
stage cifar_bbb_quant python experiments/sweep.py quant \
  --methods bbb --tiers cifar --seeds 1 2 3 --out "$OUT" \
  --extra --data "$DATA"
stage mnist_float python experiments/sweep.py float \
  --methods pointwise mcdropout bbb sgld --tiers mnist --seeds 1 2 3 \
  --out "$OUT" --extra --data "$DATA"
# per-method stages so a wall-clock cutoff leaves clean, complete methods;
# sgld last (its per-snapshot QAT makes it the most expensive)
stage mnist_quant_bbb python experiments/sweep.py quant \
  --methods bbb --tiers mnist --seeds 1 2 3 \
  --out "$OUT" --extra --data "$DATA"
stage mnist_quant_pointwise python experiments/sweep.py quant \
  --methods pointwise --tiers mnist --seeds 1 2 3 \
  --out "$OUT" --extra --data "$DATA"
stage mnist_quant_mcdropout python experiments/sweep.py quant \
  --methods mcdropout --tiers mnist --seeds 1 2 3 \
  --out "$OUT" --extra --data "$DATA"
stage mnist_quant_sgld python experiments/sweep.py quant \
  --methods sgld --tiers mnist --seeds 1 2 3 \
  --out "$OUT" --extra --data "$DATA"
stage figures_cifar python tools/make_grid_plots.py "$OUT" \
  --dataset cifar --out "$OUT/figures/cifar"
stage figures_mnist python tools/make_grid_plots.py "$OUT" \
  --dataset mnist --out "$OUT/figures/mnist"
echo "CAMPAIGN_DONE $(date)"
