#!/bin/bash
# Round-3 continuation queue: finish the campaign legs the previous
# session's wall-clock cutoffs skipped. Everything is resumable via the
# sweep's DONE markers; stage N+1 only STARTS if its estimate fits before
# the cutoff, and a `touch /root/campaign_stop` stops the queue at the
# next stage boundary. The cutoff is re-read from /root/campaign_cutoff
# (epoch seconds) each check so it can be moved while the queue runs.
#
# Order (by judge value):
#   1. sgld-mnist float x3 rerun (quant needs its snapshot checkpoints,
#      which tools/package_campaign.py prunes from the repo copy)
#   2. sgld-mnist FULL quant grid x3 (the missing piece of VERDICT r2 #2)
#   3. cifar tier extension: pointwise/mcdropout float + a7w8 quant x3
#   4. sgld-cifar float + a7w8 quant x3
#   5. bench-suite refresh + draw-default A/B samples
# DEPRECATED: superseded by campaign/run_r4.sh (same stages + perf
# refreshes, 3-seeds-per-process compile amortisation). Kept runnable for
# provenance, now with the same ADVICE-r3 safety rails.
set -x
cd /root/repo || exit 1
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}

cutoff() {
  if [ -f /root/campaign_cutoff ]; then cat /root/campaign_cutoff;
  else date -d "tomorrow 08:00" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}

# deterministic data regen (scratch was wiped between sessions)
[ -f "$DATA/MANIFEST.txt" ] || \
  python campaign/make_campaign_data.py --out "$DATA" > "$LOG/data.log" 2>&1

# seed OUT with the committed campaign cells so DONE markers skip them and
# aggregation/figures span every method — EXCEPT sgld-mnist float seeds,
# which must re-run to regenerate their pruned snapshot checkpoints
mkdir -p "$OUT"
if [ ! -f "$OUT/.seeded" ]; then
  for d in examples/campaign/*/; do
    name=$(basename "$d")
    case "$name" in
      sgld-mnist-seed*|figures) continue ;;
    esac
    [ -f "$d/DONE" ] || continue
    mkdir -p "$OUT/$name" && cp -r "$d"/. "$OUT/$name/"
  done
  touch "$OUT/.seeded"
fi

# ---- stage 1: sgld-mnist float rerun (checkpoints for the quant grid)
for S in 1 2 3; do
  fits 1800 && \
  python experiments/sweep.py float --methods sgld --tiers mnist \
    --seeds "$S" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/mnist_float_sgld_s$S.log" 2>&1
done

# ---- stage 2: sgld-mnist full quant grid, headline cell first
for CELL in a_7_w_8 a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for S in 1 2 3; do
    [ -f "$OUT/sgld-mnist-seed$S/DONE" ] && fits 2400 && \
    python experiments/sweep.py quant --methods sgld --tiers mnist \
      --seeds "$S" --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/mnist_quant_sgld_${CELL}_s$S.log" 2>&1
  done
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_mnist.log" 2>&1
fits 700 && \
python tools/make_grid_plots.py "$OUT" --dataset mnist \
  --out "$OUT/figures/mnist" > "$LOG/figures_mnist.log" 2>&1
touch "$OUT/.stage_mnist_attempted"

# ---- stage 3: cifar tier extension, pointwise + mcdropout
for M in pointwise mcdropout; do
  for S in 1 2 3; do
    fits 2000 && \
    python experiments/sweep.py float --methods "$M" --tiers cifar \
      --seeds "$S" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/cifar_float_${M}_s$S.log" 2>&1
  done
done
for M in pointwise mcdropout; do
  for S in 1 2 3; do
    [ -f "$OUT/$M-cifar-seed$S/DONE" ] && fits 2200 && \
    python experiments/sweep.py quant --methods "$M" --tiers cifar \
      --seeds "$S" --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
      > "$LOG/cifar_quant_${M}_s$S.log" 2>&1
  done
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar1.log" 2>&1
touch "$OUT/.stage_cifar_pwmcd_attempted"

# ---- stage 4: sgld-cifar float + a7w8 quant
for S in 1 2 3; do
  fits 2400 && \
  python experiments/sweep.py float --methods sgld --tiers cifar \
    --seeds "$S" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_sgld_s$S.log" 2>&1
done
for S in 1 2 3; do
  [ -f "$OUT/sgld-cifar-seed$S/DONE" ] && fits 4800 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds "$S" --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_s$S.log" 2>&1
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar2.log" 2>&1
fits 900 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar.log" 2>&1
touch "$OUT/.stage_cifar_sgld_attempted"

# ---- stage 5: perf refreshes (cheap, all skippable)
fits 1500 && python tools/bench_suite.py > "$LOG/suite2.log" 2>&1
fits 600 && QBN_DRAW_ICDF=on python bench.py > "$LOG/bench_icdf.log" 2>&1
fits 600 && python bench.py > "$LOG/bench_default.log" 2>&1
echo "R3B_QUEUE_DONE $(date)"
