#!/bin/bash
# Regression-tier campaign (VERDICT r3 item 2) on the HOST CPU backend.
#
# The tier is MLP-scale (reference: experiments/utils.py:134-193 — 7
# datasets x K folds per run, linear/MLP models): each fold runs FASTER on
# XLA-CPU than through the TPU relay's per-dispatch RTT (measured ~7 s/fold
# CPU), and QBN_CPU=1 (experiments/run.py) pins jax_platforms=cpu before
# backend init so the run coexists with the one-TPU campaign queue.
#
# Safety rails (ADVICE r3):
#   * lockfile via mkdir — a second launch exits instead of interleaving
#     duplicate runs (the round-3 surviving-driver hazard, CLAUDE.md);
#   * WAITS for any live regression sweep driver instead of racing it;
#   * quant stages gate on the matching float seed's DONE marker, not just
#     on time, so a skipped float seed cannot crash its quant cells;
#   * stage markers are named .stage_*_attempted (cutoff may skip cells).
#
# Resumable: sweep.py DONE markers skip finished cells. Cutoff re-read from
# /root/campaign_cutoff_reg (epoch secs) each check; `touch
# /root/campaign_stop_reg` stops at the next cell boundary.
#
# Scale vs the reference: the reference ran 3 seeds x (float + 11 quant
# cells) per method (run_all_float.sh / run_all_quant.sh regression lines);
# stages below are ordered so the headline figures (4-method float + a7w8
# candlesticks, bbb bit-width lines) complete first, then the grid widens
# to the reference's full extent as the cutoff allows.
set -x
cd /root/repo || exit 1
LOCK=/root/campaign_reg.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT

# wait (don't race) for any regression sweep left by a previous session
while ps aux | grep -v grep | grep "experiments/sweep.py" \
    | grep -q "regression"; do
  sleep 60
done

LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}
DATA=${DATA:-/root/campaign_data}
export QBN_CPU=1

cutoff() {
  if [ -f /root/campaign_cutoff_reg ]; then cat /root/campaign_cutoff_reg;
  else date -d "+10 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop_reg ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() { [ -f "$OUT/$1-regression-seed$2/DONE" ]; }

[ -f "$DATA/MANIFEST.txt" ] || \
  python campaign/make_campaign_data.py --out "$DATA" > "$LOG/data.log" 2>&1
mkdir -p "$OUT"

SW() { nice -n 10 python experiments/sweep.py "$@"; }

# ---- stage F: float, all 4 methods x 3 seeds (seed-major so the 4-method
#      float candlesticks exist after the first pass)
for S in 1 2 3; do
  for M in pointwise mcdropout bbb; do
    fits 1800 && \
    SW float --methods "$M" --tiers regression --seeds "$S" \
      --out "$OUT" --extra --data "$DATA" \
      > "$LOG/reg_float_${M}_s$S.log" 2>&1
  done
  fits 3600 && \
  SW float --methods sgld --tiers regression --seeds "$S" \
    --out "$OUT" --extra --data "$DATA" \
    > "$LOG/reg_float_sgld_s$S.log" 2>&1
done
touch "$OUT/.stage_reg_float_attempted"

# ---- stage Q1: the INT8 headline cell (a7w8), all methods x 3 seeds
for S in 1 2 3; do
  for M in pointwise mcdropout bbb; do
    float_done "$M" "$S" && fits 1200 && \
    SW quant --methods "$M" --tiers regression --seeds "$S" \
      --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
      > "$LOG/reg_quant_${M}_a_7_w_8_s$S.log" 2>&1
  done
  float_done sgld "$S" && fits 4800 && \
  SW quant --methods sgld --tiers regression --seeds "$S" \
    --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/reg_quant_sgld_a_7_w_8_s$S.log" 2>&1
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_reg1.log" 2>&1
touch "$OUT/.stage_reg_a7w8_attempted"

# ---- stage Q2: bbb full quant grid (the bit-width line figure)
for CELL in a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for S in 1 2 3; do
    float_done bbb "$S" && fits 1200 && \
    SW quant --methods bbb --tiers regression --seeds "$S" \
      --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/reg_quant_bbb_${CELL}_s$S.log" 2>&1
  done
done
python tools/reaggregate.py "$OUT" > "$LOG/reagg_reg2.log" 2>&1
touch "$OUT/.stage_reg_bbb_grid_attempted"

# ---- stage Q3: pointwise + mcdropout full quant grids
for CELL in a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for S in 1 2 3; do
    for M in pointwise mcdropout; do
      float_done "$M" "$S" && fits 1200 && \
      SW quant --methods "$M" --tiers regression --seeds "$S" \
        --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
        > "$LOG/reg_quant_${M}_${CELL}_s$S.log" 2>&1
    done
  done
done
touch "$OUT/.stage_reg_pwmcd_grid_attempted"

# ---- stage Q4: sgld full quant grid (per-snapshot QAT — most expensive)
for CELL in a_7_w_7 a_7_w_6 a_7_w_5 a_7_w_4 a_7_w_3 \
            a_6_w_8 a_5_w_8 a_4_w_8 a_3_w_8; do
  for S in 1 2 3; do
    float_done sgld "$S" && fits 4800 && \
    SW quant --methods sgld --tiers regression --seeds "$S" \
      --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/reg_quant_sgld_${CELL}_s$S.log" 2>&1
  done
done
touch "$OUT/.stage_reg_sgld_grid_attempted"

# ---- figures
python tools/reaggregate.py "$OUT" > "$LOG/reagg_reg3.log" 2>&1
python tools/make_grid_plots.py "$OUT" --dataset regression \
  --out "$OUT/figures/regression" > "$LOG/figures_regression.log" 2>&1
echo "REG_QUEUE_DONE $(date)"
