#!/bin/bash
# TPU work to run once the campaign + perf session queue drains.
# Editable until run_post_sgld.sh invokes it.
set -x
cd /root/repo
LOG=${LOG:-/root/campaign_logs}
python tools/microbench_draw_small.py > "$LOG/draw_small.log" 2>&1
# headline A/B of the draw-layout default: round-2 measured flat faster,
# the round-3 microbench reverses it (both ~0.5 ms apart on a 60+ ms
# program) — decide the default on the end-to-end number
QBN_DRAW_FLAT=off python bench.py > "$LOG/bench_natural.log" 2>&1
QBN_DRAW_FLAT=off python bench.py >> "$LOG/bench_natural.log" 2>&1
python bench.py > "$LOG/bench_flat.log" 2>&1

# CIFAR tier extension to the other 3 methods (the reference's cifar
# campaign spans all four: presentation/plot_locally.sh cifar_float +
# cifar_a_7_w_8 candlesticks). Float 300-epoch x 3 seeds each, then the
# INT8 a7w8 cell; sgld last (most expensive), everything resumable via
# the sweep's DONE markers.
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
# wall-clock cutoffs: the round-end driver needs the TPU free for its
# own bench run — do not START a stage past its cutoff (all stages are
# resumable next round via the sweep's DONE markers)
# TPU must be free by ~04:30 (round end ~04:38); a stage only STARTS if
# its expected duration fits before then
CUTOFF_MAIN=${CUTOFF_MAIN:-$(date -d "tomorrow 04:30" +%s)}
# if the payload somehow runs AFTER 04:30 next day, 'tomorrow 04:30' is
# in the future by construction of the chain (payload starts tonight)
fits() { [ "$(( $(date +%s) + $1 ))" -lt "$CUTOFF_MAIN" ]; }
fits 6000 && \
python experiments/sweep.py float --methods pointwise mcdropout --tiers cifar \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_float_pw_mcd.log" 2>&1
fits 6600 && \
python experiments/sweep.py quant --methods pointwise mcdropout --tiers cifar \
  --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_quant_pw_mcd.log" 2>&1
fits 5400 && \
python experiments/sweep.py float --methods sgld --tiers cifar \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_float_sgld.log" 2>&1
fits 12600 && \
python experiments/sweep.py quant --methods sgld --tiers cifar \
  --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_quant_sgld.log" 2>&1
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar3.log" 2>&1

# trailing (guarded) perf refreshes: the perf session's bench_suite leg
# crashed on a TPU worker restart; one more flat + icdf headline sample
# balances the draw-default A/B. All cheap, all skippable at cutoff.
fits 1500 && python tools/bench_suite.py > "$LOG/suite2.log" 2>&1
fits 1200 && python bench.py > "$LOG/bench_flat2.log" 2>&1
fits 1200 && QBN_DRAW_ICDF=on python bench.py > "$LOG/bench_icdf2.log" 2>&1
echo "payload done $(date)"
