#!/bin/bash
# Round-4 TPU campaign queue (VERDICT r3 items 1, 4, 8): drain the r3b
# remainder, then the perf refreshes. Everything resumable via the sweep's
# DONE markers; a stage only STARTS a cell if its estimate fits before the
# cutoff; `touch /root/campaign_stop` stops at the next cell boundary. The
# cutoff is re-read from /root/campaign_cutoff (epoch secs) each check.
#
# Safety rails (ADVICE r3):
#   * lockfile via mkdir — a second launch exits instead of interleaving
#     duplicate runs (the round-3 surviving-driver hazard, CLAUDE.md);
#   * quant stages gate on the matching float seed's DONE marker;
#   * stage markers named .stage_*_attempted (the cutoff may skip cells).
#
# Throughput note: each sweep invocation below runs ALL THREE SEEDS of a
# cell in ONE process — run_main is called in-process, so the jit cache is
# shared across seeds and the multi-minute remote compile is paid once per
# cell instead of three times (the r3b script paid it per seed).
#
# Order (by judge value — VERDICT r3 "what's missing" #1):
#   1. sgld-mnist float x3 (regenerates the snapshot ckpts the repo prunes)
#   2. sgld-mnist FULL quant grid x3, headline cell first
#   3. cifar pointwise+mcdropout: float x3 + a7w8 x3
#   4. cifar sgld: float x3 + a7w8 x3
#   5. figures + reaggregate
#   6. bench_suite refresh (VERDICT #4) + serving profile (VERDICT #8)
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
  else date -d "+9 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() {  # float_done <method> <tier> -> all 3 seeds DONE
  [ -f "$OUT/$1-$2-seed1/DONE" ] && [ -f "$OUT/$1-$2-seed2/DONE" ] &&
  [ -f "$OUT/$1-$2-seed3/DONE" ]
}

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

# ---- stage 1: sgld-mnist float x3 (one process, shared jit cache)
fits 3600 && \
python experiments/sweep.py float --methods sgld --tiers mnist \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/mnist_float_sgld.log" 2>&1
touch "$OUT/.stage_mnist_sgld_float_attempted"

# ---- stage 2: sgld-mnist full quant grid, headline cell first
for CELL in a_7_w_8 a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  float_done sgld mnist && fits 3000 && \
  python experiments/sweep.py quant --methods sgld --tiers mnist \
    --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/mnist_quant_sgld_$CELL.log" 2>&1
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_mnist.log" 2>&1
fits 700 && \
python tools/make_grid_plots.py "$OUT" --dataset mnist \
  --out "$OUT/figures/mnist" > "$LOG/figures_mnist.log" 2>&1
touch "$OUT/.stage_mnist_sgld_quant_attempted"

# ---- stage 3: cifar tier extension, pointwise + mcdropout
for M in pointwise mcdropout; do
  fits 4500 && \
  python experiments/sweep.py float --methods "$M" --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_$M.log" 2>&1
done
for M in pointwise mcdropout; do
  float_done "$M" cifar && fits 3600 && \
  python experiments/sweep.py quant --methods "$M" --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_$M.log" 2>&1
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar1.log" 2>&1
touch "$OUT/.stage_cifar_pwmcd_attempted"

# ---- stage 4: sgld-cifar float + a7w8 quant
fits 6000 && \
python experiments/sweep.py float --methods sgld --tiers cifar \
  --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_float_sgld.log" 2>&1
float_done sgld cifar && fits 7200 && \
python experiments/sweep.py quant --methods sgld --tiers cifar \
  --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
  > "$LOG/cifar_quant_sgld.log" 2>&1
python tools/reaggregate.py "$OUT" > "$LOG/reagg_cifar2.log" 2>&1
fits 900 && \
python tools/make_grid_plots.py "$OUT" --dataset cifar \
  --out "$OUT/figures/cifar" > "$LOG/figures_cifar.log" 2>&1
touch "$OUT/.stage_cifar_sgld_attempted"

# ---- stage 5: perf refreshes (cheap, all skippable)
fits 1800 && python tools/bench_suite.py > "$LOG/suite_r4.log" 2>&1
fits 1200 && python tools/bench_serving.py \
  --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
  > "$LOG/serving_r4.log" 2>&1
fits 600 && python bench.py > "$LOG/bench_r4.log" 2>&1
echo "R4_QUEUE_DONE $(date)"
