#!/bin/bash
# Regenerate every parity table from the experiment dirs produced by
# parity/run_all.sh + run_hard.sh + rerun_hard_ours.sh + run_hard_seeds.sh
# + run_digits.sh + run_regression.sh + run_diabetes.sh + run_sgld.sh +
# the cifar driver (see refresh_after_loader_fix.sh for the full ours-side
# sequence). Tables land in /tmp/tables/*.md; the committed docs splice
# these tables between their prose sections.
set -e
cd "$(dirname "$0")/.."
W=/tmp/parity
WD=/tmp/parity_digits
T=/tmp/tables
mkdir -p $T

R()  { ls -dt $W/ref_$1/$2-* | head -1; }
O()  { ls -dt $W/ours_$1/$2-* | head -1; }
RD() { ls -dt $WD/ref_$1/$2-* | head -1; }
OD() { ls -dt $WD/ours_$1/$2-* | head -1; }
RH() { ls -dt $W/ref_hard_$1$2/$3-* | head -1; }
OH() { ls -dt $W/ours_hard_$1$2/$3-* | head -1; }

# mnist main tier (docs/PARITY.md top + distortion section)
python parity/compare.py --out $T/mnist.md --pairs \
  pointwise:float:$(R pointwise not_q):$(O pointwise not_q) \
  pointwise:int8_a7w8:$(R pointwise qat):$(O pointwise qat) \
  bbb:float:$(R bbb not_q):$(O bbb not_q) \
  bbb:int8_a7w8:$(R bbb qat):$(O bbb qat) \
  mcdropout:float:$(R mcdropout not_q):$(O mcdropout not_q) \
  mcdropout:int8_a7w8:$(R mcdropout qat):$(O mcdropout qat) > /dev/null

# SGHMC ensemble cell
python parity/compare.py --out $T/sgld.md --pairs \
  sgld:float:$(R sgld not_q):$(O sgld not_q) \
  sgld:int8_a7w8:$(R sgld qat):$(O sgld qat) > /dev/null

# hard task, seed 1 (docs/PARITY_HARD.md)
python parity/compare.py --out $T/hard.md --pairs \
  pointwise:float:$(RH pointwise '' not_q):$(OH pointwise '' not_q) \
  pointwise:int8_a7w8:$(RH pointwise '' qat):$(OH pointwise '' qat) \
  bbb:float:$(RH bbb '' not_q):$(OH bbb '' not_q) \
  bbb:int8_a7w8:$(RH bbb '' qat):$(OH bbb '' qat) > /dev/null

# hard task, multi-seed aggregation (docs/PARITY_HARD_SEEDS.md;
# pointwise/int8 seeds 1-3, bbb float seeds 1-6)
python parity/aggregate_seeds.py --out $T/hard_seeds.md --cells \
  "pointwise:float:$(RH pointwise '' not_q),$(RH pointwise _s2 not_q),$(RH pointwise _s3 not_q):$(OH pointwise '' not_q),$(OH pointwise _s2 not_q),$(OH pointwise _s3 not_q)" \
  "pointwise:int8_a7w8:$(RH pointwise '' qat),$(RH pointwise _s2 qat),$(RH pointwise _s3 qat):$(OH pointwise '' qat),$(OH pointwise _s2 qat),$(OH pointwise _s3 qat)" \
  "bbb:float:$(RH bbb '' not_q),$(RH bbb _s2 not_q),$(RH bbb _s3 not_q),$(RH bbb _s4 not_q),$(RH bbb _s5 not_q),$(RH bbb _s6 not_q):$(OH bbb '' not_q),$(OH bbb _s2 not_q),$(OH bbb _s3 not_q),$(OH bbb _s4 not_q),$(OH bbb _s5 not_q),$(OH bbb _s6 not_q)" \
  "bbb:int8_a7w8:$(RH bbb '' qat),$(RH bbb _s2 qat),$(RH bbb _s3 qat):$(OH bbb '' qat),$(OH bbb _s2 qat),$(OH bbb _s3 qat)" > /dev/null

# real digits tier
python parity/compare.py --out $T/digits.md --pairs \
  pointwise:float:$(RD pointwise not_q):$(OD pointwise not_q) \
  pointwise:int8_a7w8:$(RD pointwise qat):$(OD pointwise qat) \
  bbb:float:$(RD bbb not_q):$(OD bbb not_q) \
  bbb:int8_a7w8:$(RD bbb qat):$(OD bbb qat) \
  mcdropout:float:$(RD mcdropout not_q):$(OD mcdropout not_q) \
  mcdropout:int8_a7w8:$(RD mcdropout qat):$(OD mcdropout qat) > /dev/null

# regression tier (synthetic + byte-identical UCI)
python parity/compare.py --out $T/regr.md --pairs \
  pointwise:float:$(R regr_pointwise not_q):$(O regr_pointwise not_q) \
  pointwise:int8_a7w8:$(R regr_pointwise qat):$(O regr_pointwise qat) \
  bbb:float:$(R regr_bbb not_q):$(O regr_bbb not_q) \
  bbb:int8_a7w8:$(R regr_bbb qat):$(O regr_bbb qat) > /dev/null
python parity/compare.py --out $T/regr_mcd_sgld.md --pairs \
  mcdropout:float:$(R regr_mcdropout not_q):$(O regr_mcdropout not_q) \
  mcdropout:int8_a7w8:$(R regr_mcdropout qat):$(O regr_mcdropout qat) \
  sgld:float:$(R regr_sgld not_q):$(O regr_sgld not_q) \
  sgld:int8_a7w8:$(R regr_sgld qat):$(O regr_sgld qat) > /dev/null

# real diabetes tier
python parity/compare.py --out $T/diabetes.md --pairs \
  bbb:float:$(R diab_bbb not_q):$(O diab_bbb not_q) \
  bbb:int8_a7w8:$(R diab_bbb qat):$(O diab_bbb qat) \
  mcdropout:float:$(R diab_mcdropout not_q):$(O diab_mcdropout not_q) \
  mcdropout:int8_a7w8:$(R diab_mcdropout qat):$(O diab_mcdropout qat) > /dev/null

# cifar tier (flagship BBB ResNet-18 w24)
python parity/compare.py --out $T/cifar.md --pairs \
  bbb:float:$(R cifar_bbb not_q):$(O cifar_bbb not_q) \
  bbb:int8_a7w8:$(R cifar_bbb qat):$(O cifar_bbb qat) > /dev/null

# cifar tier, remaining methods (run_cifar_more.sh) — rendered only
# once those cells exist
if ls $W/ref_cifar_mcdropout/not_q-cifar* >/dev/null 2>&1; then
python parity/compare.py --out $T/cifar_more.md --pairs \
  mcdropout:float:$(R cifar_mcdropout not_q):$(O cifar_mcdropout not_q) \
  mcdropout:int8_a7w8:$(R cifar_mcdropout qat):$(O cifar_mcdropout qat) \
  pointwise:float:$(R cifar_pointwise not_q):$(O cifar_pointwise not_q) \
  pointwise:int8_a7w8:$(R cifar_pointwise qat):$(O cifar_pointwise qat) \
  > /dev/null
fi

# real digits tier — SGHMC ensemble cell (run_digits_sgld.sh), seed 1
if ls $WD/ref_sgld/not_q-* >/dev/null 2>&1; then
python parity/compare.py --out $T/digits_sgld.md --pairs \
  sgld:float:$(RD sgld not_q):$(OD sgld not_q) \
  sgld:int8_a7w8:$(RD sgld qat):$(OD sgld qat) > /dev/null
fi

# real digits multi-seed aggregation (run_digits_seeds.sh seeds 2-3 +
# the seed-1 cells)
RDS() { ls -dt $WD/ref_$1_s$2/$3-* | head -1; }
ODS() { ls -dt $WD/ours_$1_s$2/$3-* | head -1; }
if ls $WD/ref_sgld_s3/qat-* >/dev/null 2>&1; then
python parity/aggregate_seeds.py --out $T/digits_sgld_seeds.md --cells \
  "sgld:float:$(RD sgld not_q),$(RDS sgld 2 not_q),$(RDS sgld 3 not_q):$(OD sgld not_q),$(ODS sgld 2 not_q),$(ODS sgld 3 not_q)" \
  "sgld:int8_a7w8:$(RD sgld qat),$(RDS sgld 2 qat),$(RDS sgld 3 qat):$(OD sgld qat),$(ODS sgld 2 qat),$(ODS sgld 3 qat)" > /dev/null
fi
if ls $WD/ref_bbb_s3/qat-* >/dev/null 2>&1; then
python parity/aggregate_seeds.py --out $T/digits_bbb_seeds.md --cells \
  "bbb:float:$(RD bbb not_q),$(RDS bbb 2 not_q),$(RDS bbb 3 not_q):$(OD bbb not_q),$(ODS bbb 2 not_q),$(ODS bbb 3 not_q)" \
  "bbb:int8_a7w8:$(RD bbb qat),$(RDS bbb 2 qat),$(RDS bbb 3 qat):$(OD bbb qat),$(ODS bbb 2 qat),$(ODS bbb 3 qat)" > /dev/null
fi

# mnist-tier SGHMC + mcdropout multi-seed aggregation (run_seeds1.sh +
# run_seeds_more.sh; seeds 1-3 on the regenerated 10k/2k dataset) —
# resolves whether the single-seed sgld OOD-entropy and mcdropout INT8
# OOD-NLL deltas are seed noise (VERDICT r2 weak #2/#3)
WS() { ls -dt $W/ref_$1_s$2/$3-* | head -1; }
OS() { ls -dt $W/ours_$1_s$2/$3-* | head -1; }
if ls $W/ours_mcd_s1/qat-* >/dev/null 2>&1; then
python parity/aggregate_seeds.py --out $T/mnist_seeds.md --cells \
  "sgld:float:$(WS sgld 1 not_q),$(WS sgld 2 not_q),$(WS sgld 3 not_q):$(OS sgld 1 not_q),$(OS sgld 2 not_q),$(OS sgld 3 not_q)" \
  "sgld:int8_a7w8:$(WS sgld 1 qat),$(WS sgld 2 qat),$(WS sgld 3 qat):$(OS sgld 1 qat),$(OS sgld 2 qat),$(OS sgld 3 qat)" \
  "mcdropout:float:$(WS mcd 1 not_q),$(WS mcd 2 not_q),$(WS mcd 3 not_q):$(OS mcd 1 not_q),$(OS mcd 2 not_q),$(OS mcd 3 not_q)" \
  "mcdropout:int8_a7w8:$(WS mcd 1 qat),$(WS mcd 2 qat),$(WS mcd 3 qat):$(OS mcd 1 qat),$(OS mcd 2 qat),$(OS mcd 3 qat)" > /dev/null
fi

echo "tables rendered under $T/"
