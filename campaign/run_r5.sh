#!/bin/bash
# Round-5 TPU queue — drain everything round 4 could not. Run me FIRST
# THING next session (after `sysctl -w vm.max_map_count=1048576` and the
# `ps aux` surviving-driver check; budget ~20 min of dead TPU time for
# the first process — CLAUDE.md hazards).
#
# State handed over by round 4 (examples/campaign):
#   * mcdropout-cifar: MISSING ENTIRELY — its float leg crashed the TPU
#     worker twice (rounds 4b & 4d), both times in the monolithic 15-cell
#     distortion program ("UNAVAILABLE ... kernel fault"); test/OOD scan
#     evals of the same shape succeeded, and pointwise/bbb run the same
#     program fine. QBN_DIST_SPLIT=on dispatches one small program per
#     cell instead (bitwise-tested fallback, commit with
#     tests/test_distortion_sweep.py::test_sweep_split_mode_bitwise).
#   * pointwise-cifar: float x3 + a7w8 x3 committed WITH float ckpts
#     (weights.msgpack in the repo trees) — more quant cells need no
#     float rerun.
#   * sgld-cifar: float RESULTS committed, ckpts pruned — quant needs a
#     float rerun (~30 min; sgld trains fast, snapshots add I/O).
#   * bbb-cifar + all-MNIST: complete from rounds 3/3b.
# Float reruns bit-reproduce committed results (round-3b determinism
# check), so re-running is safe.
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
fresh_floats() {  # clear repo-restored seed dirs that have DONE but no ckpt
  for S in 1 2 3; do
    D="$OUT/$1-cifar-seed$S"
    if [ -d "$D" ] && [ ! -f "$D/weights.msgpack" ] && \
       ! ls "$D"/weights_*.msgpack >/dev/null 2>&1; then rm -rf "$D"; fi
  done
}
refig() {
  python tools/reaggregate.py "$OUT" > "$LOG/reagg_$1.log" 2>&1
  python tools/make_grid_plots.py "$OUT" --dataset cifar \
    --out "$OUT/figures/cifar" > "$LOG/figures_$1.log" 2>&1
}

[ -f "$DATA/MANIFEST.txt" ] || \
  python campaign/make_campaign_data.py --out "$DATA" \
    > "$LOG/make_data.log" 2>&1

# seed OUT with committed trees (incl. pointwise float ckpts) so DONE
# markers skip finished work and figures span every method
if [ ! -f "$OUT/.seeded" ]; then
  for d in examples/campaign/*/; do
    name=$(basename "$d")
    [ "$name" = figures ] && continue
    [ -f "$d/DONE" ] || [[ "$name" == *-avg ]] || continue
    mkdir -p "$OUT/$name" && cp -r "$d"/. "$OUT/$name/"
  done
  touch "$OUT/.seeded"
fi

# ---- stage A: mcdropout-cifar with the split distortion fallback
fresh_floats mcdropout
if ! float_done mcdropout; then
  fits 4500 && \
  QBN_DIST_SPLIT=on python experiments/sweep.py float --methods mcdropout \
    --tiers cifar --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_mcdropout_r5.log" 2>&1
fi
float_done mcdropout && [ -f "$OUT/mcdropout-cifar-seed1/weights.msgpack" ] \
  && [ ! -f "$OUT/mcdropout-cifar-a_7_w_8-seed3/DONE" ] && fits 2400 && \
  QBN_DIST_SPLIT=on python experiments/sweep.py quant --methods mcdropout \
    --tiers cifar --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra \
    --data "$DATA" > "$LOG/cifar_quant_mcdropout_r5.log" 2>&1
refig r5_mcd

# ---- stage B: sgld-cifar float rerun (ckpts) + a7w8
fresh_floats sgld
if ! float_done sgld; then
  fits 5400 && \
  python experiments/sweep.py float --methods sgld --tiers cifar \
    --seeds 1 2 3 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_float_sgld_r5.log" 2>&1
fi
float_done sgld && \
  ls "$OUT/sgld-cifar-seed1"/weights_*.msgpack >/dev/null 2>&1 && \
  [ ! -f "$OUT/sgld-cifar-a_7_w_8-seed3/DONE" ] && fits 3600 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells a_7_w_8 --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_r5.log" 2>&1
refig r5_sgld

# ---- stage C: extra cells, value-first, cell-major across methods
for CELL in a_7_w_4 a_7_w_6 a_7_w_3 a_4_w_8 a_7_w_5 a_6_w_8 a_5_w_8 \
            a_3_w_8 a_7_w_7; do
  for M in pointwise mcdropout; do
    FLAGS=""; [ "$M" = mcdropout ] && FLAGS="QBN_DIST_SPLIT=on"
    float_done "$M" && [ -f "$OUT/$M-cifar-seed1/weights.msgpack" ] && \
      [ ! -f "$OUT/$M-cifar-$CELL-seed3/DONE" ] && fits 2400 && \
    env $FLAGS python experiments/sweep.py quant --methods "$M" \
      --tiers cifar --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra \
      --data "$DATA" > "$LOG/cifar_quant_${M}_${CELL}_r5.log" 2>&1
  done
  float_done sgld && \
    ls "$OUT/sgld-cifar-seed1"/weights_*.msgpack >/dev/null 2>&1 && \
    [ ! -f "$OUT/sgld-cifar-$CELL-seed3/DONE" ] && fits 3600 && \
  python experiments/sweep.py quant --methods sgld --tiers cifar \
    --seeds 1 2 3 --cells "$CELL" --out "$OUT" --extra --data "$DATA" \
    > "$LOG/cifar_quant_sgld_${CELL}_r5.log" 2>&1
  refig "r5_$CELL"
done
fits 900 && python bench.py > "$LOG/bench_r5.log" 2>&1
echo "R5_QUEUE_DONE $(date)"

# Companion CPU queue (run alongside, single core): regression quant
# grid continuation — committed float ckpts for pointwise/mcdropout/bbb
# mean `experiments/sweep.py quant --tiers regression` resumes directly
# after seeding OUT; sgld-regression seed 3 must re-run first
# (killed by the mmap limit in round 4 — fix the sysctl first):
#   QBN_CPU=1 python experiments/sweep.py float --methods sgld \
#     --tiers regression --seeds 3 --out "$OUT" --extra --data "$DATA"
# then resume campaign/run_reg_r4fix.sh-style cell-major quant cells.
