#!/bin/sh
# Time-to-gate campaign (VERDICT r2 item 4): measured recipes, one chip,
# cold compile cache (the honest "first run on a fresh machine" clock),
# stop at the first gate crossing (corr >= 0.95 AND L err <= 0.05 on the
# best-val weights). Results land in benchmarks/ttg_<tag>.json and are
# summarized in RESULTS.md ("Round 3: time-to-gate").
#
# Run sequentially: one TPU process at a time (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== ttg $tag ==="
  timeout 3600 python benchmarks/time_to_gate.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/ttg_${tag}.log" | tail -20
}

# 1. Baseline: the round-2 flagship recipe as-is (seed 1, batch 64,
#    progressive step-5 curriculum, 25-epoch dispatch).
run base --seed 1

# 2. Masked single-compile curriculum (one program for the whole ramp,
#    exact one-length-per-epoch reference curriculum).
run masked --seed 1 --masked --prog-step 1

# 3. Large batch + sqrt-scaled lr: full-batch steps (405 = whole train
#    split), one optimizer step per epoch.
run bigbatch405 --seed 1 --batch-size 405 --lr 2.5e-3

# 4. bf16 NN stages (f32 solve) on the masked recipe.
run bf16_masked --seed 1 --masked --prog-step 1 --dtype bf16

# 5. Population: wide start (8 tapes), early prune to the 2 best-val
#    replicas at epoch 500.
run pop8_prune --seed 1 --seeds 8 --prune-at 500 --prune-keep 2
