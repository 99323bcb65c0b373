#!/bin/bash
# Round-4 fourth queue (fresh container: /root state outside the repo was
# wiped between sessions, so /root/campaign_runs and all float checkpoints
# are gone — only the committed results trees in examples/campaign
# survive; tools/package_campaign.py prunes weights, so quant legs must
# re-run their floats, which bit-reproduce committed results — verified
# in round 3b, docs/STATUS.md).
#
# Order of value:
#   P  — the twice-crashed cheap perf artifacts (tools/bench_suite.py per-
#        method table = VERDICT r3 #4; freeze_draws serving bench =
#        STATUS #8). Both lost to TPU worker restarts in earlier sessions;
#        securing them first costs ~35 min.
#   A  — mcdropout-cifar float x3 + a7w8 x3: the ONLY method with no
#        committed CIFAR tree at all (its round-4b leg crashed mid-eval).
#   B  — pointwise-cifar float rerun x3 (for weights) + a7w8 x3.
#   C  — sgld-cifar float rerun + a7w8 (gated; likely cut by the cutoff).
#   D  — extra quant cells, cell-major, value-first (w4 degradation
#        region first, per run_r4c.sh rationale).
#   Z  — merge committed results-only cifar trees into OUT for 4-method
#        figures, reaggregate, render, final headline bench.
#
# Rails: lockfile, movable cutoff (/root/campaign_cutoff), stop file,
# sweep DONE-marker resume, float-DONE + WEIGHTS gating (committed trees
# have DONE but no weights — fresh_floats clears those before a float
# sweep, and quant gates check the checkpoint file, not just DONE).
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
  else date -d "+3 hours" +%s; fi
}
fits() {
  [ ! -f /root/campaign_stop ] &&
  [ "$(( $(date +%s) + $1 ))" -lt "$(cutoff)" ]
}
float_done() {
  [ -f "$OUT/$1-cifar-seed1/DONE" ] && [ -f "$OUT/$1-cifar-seed2/DONE" ] &&
  [ -f "$OUT/$1-cifar-seed3/DONE" ]
}
# a float seed dir restored from the repo copy has DONE but NO weights —
# unusable as a quant --load source; clear it so the sweep re-runs it
fresh_floats() {
  for S in 1 2 3; do
    D="$OUT/$1-cifar-seed$S"
    if [ -d "$D" ] && [ ! -f "$D/weights.msgpack" ] && \
       ! ls "$D"/weights_*.msgpack >/dev/null 2>&1; then rm -rf "$D"; fi
  done
}
# sgld quant loads epoch-stamped snapshots, not weights.msgpack
sgld_ckpts() {
  ls "$OUT/sgld-cifar-seed1"/weights_*.msgpack >/dev/null 2>&1 &&
  ls "$OUT/sgld-cifar-seed3"/weights_*.msgpack >/dev/null 2>&1
}
pm_ckpts() { [ -f "$OUT/$1-cifar-seed1/weights.msgpack" ]; }
refig() {
  python tools/reaggregate.py "$OUT" > "$LOG/reagg_$1.log" 2>&1
  python tools/make_grid_plots.py "$OUT" --dataset cifar \
    --out "$OUT/figures/cifar" > "$LOG/figures_$1.log" 2>&1
}

# deterministic campaign dataset (the container wipe took /root/campaign_data)
[ -f "$DATA/MANIFEST.txt" ] || \
  python campaign/make_campaign_data.py --out "$DATA" \
    > "$LOG/make_data.log" 2>&1

# ---- stage P: perf artifacts first
fits 2700 && python tools/bench_suite.py > "$LOG/suite_r4d.log" 2>&1
fits 1500 && python tools/bench_serving.py \
  --exp examples/campaign/bbb-cifar-a_7_w_8-seed1 --freeze_draws 7 \
  > "$LOG/serving_freeze_r4d.log" 2>&1
touch "$OUT/.stage_perf_attempted"

# ---- stage A: mcdropout-cifar (no committed tree at all)
fresh_floats mcdropout
if ! float_done mcdropout; then
  fits 4500 && \
  python experiments/sweep.py float --methods mcdropout --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_mcdropout.log" 2>&1
fi
float_done mcdropout && pm_ckpts mcdropout && \
  [ ! -f "$OUT/mcdropout-cifar-a_7_w_8-seed3/DONE" ] && fits 2400 && \
  python experiments/sweep.py quant --methods mcdropout --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_mcdropout.log" 2>&1
refig stageA

# ---- stage B: pointwise float rerun (weights) + a7w8
fresh_floats pointwise
if ! float_done pointwise; then
  fits 4200 && \
  python experiments/sweep.py float --methods pointwise --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_pointwise.log" 2>&1
fi
float_done pointwise && pm_ckpts pointwise && \
  [ ! -f "$OUT/pointwise-cifar-a_7_w_8-seed3/DONE" ] && fits 2400 && \
  python experiments/sweep.py quant --methods pointwise --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_pointwise.log" 2>&1
refig stageB

# ---- stage C: sgld float rerun + a7w8 (most expensive; gated)
fresh_floats sgld
if ! float_done sgld; then
  fits 5400 && \
  python experiments/sweep.py float --methods sgld --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_sgld.log" 2>&1
fi
float_done sgld && sgld_ckpts && \
  [ ! -f "$OUT/sgld-cifar-a_7_w_8-seed3/DONE" ] && fits 3600 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld.log" 2>&1
refig stageC

# ---- stage D: extra cells, value-first
for CELL in a_7_w_4 a_7_w_6 a_7_w_3 a_4_w_8 a_7_w_5 a_6_w_8 a_5_w_8 \
            a_3_w_8 a_7_w_7; do
  for M in pointwise mcdropout; do
    float_done "$M" && pm_ckpts "$M" && \
      [ ! -f "$OUT/$M-cifar-$CELL-seed3/DONE" ] && fits 2400 && \
    python experiments/sweep.py quant --methods "$M" --tiers cifar \
      --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
      > "$LOG/cifar_quant_${M}_${CELL}.log" 2>&1
  done
  float_done sgld && sgld_ckpts && \
    [ ! -f "$OUT/sgld-cifar-$CELL-seed3/DONE" ] && fits 3600 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_${CELL}.log" 2>&1
  refig "cell_$CELL"
done

# ---- stage Z: merge committed results-only trees for 4-method figures
# (fresh_floats above guarantees these copies can never poison a quant
# gate: any future float sweep clears weightless seed dirs first)
for d in examples/campaign/*cifar*; do
  n=$(basename "$d")
  [ -e "$OUT/$n" ] || cp -r "$d" "$OUT/$n"
done
refig stageZ
fits 900 && python bench.py > "$LOG/bench_r4d.log" 2>&1
echo "R4D_QUEUE_DONE $(date)"
