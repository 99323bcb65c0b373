#!/bin/bash
# Round-3 TPU perf session (run when the TPU is otherwise idle):
#   1. draw-formulation re-measure (advisor ask: confirm QBN_DRAW_FLAT on
#      a fresh run before trusting the new default)
#   2. chunk-size sweep of the headline bench
#   3. trained-checkpoint headline row (VERDICT r2 weak #4)
#   4. frozen-artifact serving bench (VERDICT r2 #7)
#   5. full bench table refresh
# One TPU process at a time; each step is a separate python process.
set -x
cd /root/repo
EXP=${EXP:-/root/campaign_runs/bbb-cifar-a_7_w_8-seed1}
OUT=${OUT:-/tmp/perf_r3}
mkdir -p "$OUT"

python tools/microbench_draw.py > "$OUT/draw.log" 2>&1
python tools/check_draw_stats.py > "$OUT/draw_stats.log" 2>&1
for CH in 10 20 25 50 100; do
  QBN_BENCH_CHUNK=$CH python bench.py > "$OUT/bench_chunk$CH.log" 2>&1
done
QBN_DRAW_ICDF=on python bench.py > "$OUT/bench_icdf.log" 2>&1
QBN_BENCH_EXP="$EXP" python bench.py > "$OUT/bench_trained.log" 2>&1
QBN_BENCH_EXP= python bench.py > "$OUT/bench_synth.log" 2>&1
python tools/bench_serving.py --exp "$EXP" > "$OUT/serving.log" 2>&1
python tools/bench_suite.py > "$OUT/suite.log" 2>&1
python tools/microbench_stages.py > "$OUT/stages.log" 2>&1
echo PERF_SESSION_DONE
