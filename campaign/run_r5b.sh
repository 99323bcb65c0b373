#!/bin/bash
# Round-5 chain v4 (fresh-container session, 2026-08-21 ~13:50 UTC).
# The previous session's chain v3 died with the container wipe; this
# queue re-creates scratch and drains the remaining CIFAR work in
# strict value order:
#   0. regen data + seed OUT from the committed repo trees
#   1. bench_suite mcdropout+bbb cells — the TPU measurement of the
#      round's shared-weight/batched-activation conv rule (VERDICT r4
#      item 5 "Done" = a measured BENCH_TABLE entry); cheap (~25 min)
#      and guaranteed before the long campaign tail.
#   2. mcdropout-cifar a_7_w_8 x3 — the PRIMARY INT8 cell, killed by
#      the 06:10 relay mid-compile failure, never landed.
#   3. sgld-cifar float rerun x3 (ckpts pruned from the repo copy;
#      every further sgld quant cell needs the snapshots).
#   4. sgld-cifar a_7_w_4 x3 under the FIXED trainer (first run
#      collapsed to NaN in all seeds — mutable-stats NaN-skip bug,
#      fixed in d61c7b9).
#   5. pointwise+mcdropout a_4_w_8 (completes the VERDICT minimum set
#      {a7w8,a7w6,a7w4,a7w3,a4w8} for both methods).
#   6. sgld a_7_w_3 + a_4_w_8 (completes the sgld minimum set).
#   7. remaining grid cells cell-major (a_7_w_5, a_6_w_8, a_5_w_8,
#      a_3_w_8, a_7_w_7) for pointwise/mcdropout/sgld.
#   8. headline bench + serving re-measure, then the distortion-fault
#      bisect ladder LAST (a fault wedges the chip 10-30 min).
# Every stage is DONE-marker resumable and cutoff-gated; touch
# /root/campaign_stop to drain out.
set -x
cd /root/repo || exit 1
LOCK=/root/campaign_tpu.lock
if ! mkdir "$LOCK" 2>/dev/null; then echo "lock held: $LOCK"; exit 1; fi
trap 'rmdir "$LOCK"' EXIT
LOG=${LOG:-/root/campaign_logs}; mkdir -p "$LOG"
OUT=${OUT:-/root/campaign_runs}; mkdir -p "$OUT"
DATA=${DATA:-/root/campaign_data}

cutoff() {
  if [ -f /root/campaign_cutoff ]; then cat /root/campaign_cutoff;
  else date -d "+9 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
refig() {
  python tools/reaggregate.py "$OUT" > "$LOG/reagg_$1.log" 2>&1
  python tools/make_grid_plots.py "$OUT" --dataset cifar \
    --out "$OUT/figures/cifar" > "$LOG/figures_$1.log" 2>&1
}
pmcell() {  # pmcell <method> <cell> <budget>
  local M=$1 CELL=$2 B=$3 FLAGS=""
  [ "$M" = mcdropout ] && FLAGS="QBN_DIST_SPLIT=on"
  [ -f "$OUT/$M-cifar-seed1/weights.msgpack" ] && \
    [ ! -f "$OUT/$M-cifar-$CELL-seed3/DONE" ] && fits "$B" && \
  env $FLAGS python experiments/sweep.py quant --methods "$M" \
    --tiers cifar --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra \
    --data "$DATA" > "$LOG/cifar_quant_${M}_${CELL}_r5b.log" 2>&1
}
sgldcell() {  # sgldcell <cell> <budget>
  local CELL=$1 B=$2
  ls "$OUT/sgld-cifar-seed1"/weights_*.msgpack >/dev/null 2>&1 && \
    [ ! -f "$OUT/sgld-cifar-$CELL-seed3/DONE" ] && fits "$B" && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_${CELL}_r5b.log" 2>&1
}

# ---- stage 0: data + seed OUT
[ -f "$DATA/MANIFEST.txt" ] || \
  python campaign/make_campaign_data.py --out "$DATA" \
    > "$LOG/make_data.log" 2>&1
if [ ! -f "$OUT/.seeded" ]; then
  for d in examples/campaign/*/; do
    name=$(basename "$d")
    [ "$name" = figures ] && continue
    [ -f "$d/DONE" ] || [[ "$name" == *-avg ]] || continue
    mkdir -p "$OUT/$name" && cp -r "$d"/. "$OUT/$name/"
  done
  # sgld float seed dirs have DONE but pruned snapshots -> must re-run
  for S in 1 2 3; do
    D="$OUT/sgld-cifar-seed$S"
    if [ -d "$D" ] && ! ls "$D"/weights_*.msgpack >/dev/null 2>&1; then
      rm -rf "$D"
    fi
  done
  # the committed sgld a_7_w_4 trees are the NaN-collapsed run
  rm -rf "$OUT"/sgld-cifar-a_7_w_4-seed[123] "$OUT"/sgld-cifar-a_7_w_4-avg
  touch "$OUT/.seeded"
fi

# ---- stage 1: conv-rule fix measurement (VERDICT item 5)
if [ ! -f "$LOG/suite_r5_mcd.log" ]; then
  fits 2400 && \
  python tools/bench_suite.py --only resnet_mcdropout,resnet_bbb \
    > "$LOG/suite_r5_mcd.log" 2>&1
fi

# ---- stage 2: the primary INT8 mcdropout cell
pmcell mcdropout a_7_w_8 2400
refig s2

# ---- stage 3: sgld float rerun (snapshots -> scratch)
if [ ! -f "$OUT/sgld-cifar-seed3/DONE" ]; then
  fits 5400 && \
  python experiments/sweep.py float --methods sgld --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_sgld_r5b.log" 2>&1
fi

# ---- stage 4: sgld a_7_w_4 under the NaN fix
sgldcell a_7_w_4 3600
refig s4

# ---- stage 5: pointwise/mcdropout a_4_w_8 (minimum set)
pmcell pointwise a_4_w_8 2400
pmcell mcdropout a_4_w_8 2400
refig s5

# ---- stage 6: sgld minimum set tail
sgldcell a_7_w_3 3600
sgldcell a_4_w_8 3600
refig s6

# ---- stage 7: remaining grid, cell-major
for CELL in a_7_w_5 a_6_w_8 a_5_w_8 a_3_w_8 a_7_w_7; do
  pmcell pointwise "$CELL" 2400
  pmcell mcdropout "$CELL" 2400
  sgldcell "$CELL" 3600
  refig "s7_$CELL"
done

# ---- stage 8: perf tail
fits 1200 && python bench.py > "$LOG/bench_r5b.log" 2>&1
if [ ! -f "$LOG/serving_r5.log" ]; then
  fits 2400 && \
  python tools/bench_serving.py \
    --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
    > "$LOG/serving_r5.log" 2>&1
fi
echo "R5B_QUEUE_DONE $(date)"

# ---- stage 9: distortion-fault bisect ladder (wedge risk -> last)
probe_recover() {
  for i in $(seq 1 60); do
    timeout 120 python - <<'EOF' && return 0
import jax, jax.numpy as jnp
print(float(jnp.ones(3).sum()))
EOF
    sleep 30
  done
  return 1
}
CKPT="$OUT/mcdropout-cifar-seed1/weights.msgpack"
rung() {
  local label=$1; shift
  fits 1800 || return 1
  if python tools/repro_dist_fault.py "$@" \
      > "$LOG/repro_${label}.log" 2>&1; then
    echo "RUNG_OK $label" >> "$LOG/repro_ladder.log"
    return 0
  fi
  echo "RUNG_FAULT $label (exit $?)" >> "$LOG/repro_ladder.log"
  probe_recover
  echo "RECOVERED after $label" >> "$LOG/repro_ladder.log"
  return 2
}
: > "$LOG/repro_ladder.log"
FAULT_ARGS=""
rung full_synth --cells 15 --batches 39 --samples 20; r=$?
if [ "$r" = 0 ] && [ -f "$CKPT" ]; then
  rung full_ckpt --cells 15 --batches 39 --samples 20 --ckpt "$CKPT"; r=$?
  [ "$r" = 2 ] && FAULT_ARGS="--ckpt $CKPT"
fi
if [ "$r" = 2 ]; then
  rung half_cells --cells 8 --batches 39 --samples 20 $FAULT_ARGS
  [ $? = 2 ] && rung quarter_cells --cells 4 --batches 39 --samples 20 \
    $FAULT_ARGS
  rung control_pointwise --cells 15 --batches 39 --samples 1 \
    --method pointwise
fi
echo "R5B_ALL_DONE $(date)"
