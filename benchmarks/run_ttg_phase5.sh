#!/bin/sh
# Time-to-gate phase 5: finer gate-eval cadence + seed-base robustness.
# The flagship recipes bracketed the gate crossing at 100-epoch evals;
# with pixel selection every eval is also a selection opportunity, so a
# 25-epoch cadence (one dispatch block) both tightens the bracket and
# ships the winner earlier. Third run: the f32 recipe on a disjoint seed
# base (501-508) — the tape-robustness claim should not rest on n=1
# population per dtype.
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== ttg $tag ==="
  timeout 3600 python benchmarks/time_to_gate.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/ttg_${tag}.log" | tail -4
}

run px_e25 --seed 1 --seeds 8 --masked --prog-step 5 \
    --select-by pixel --eval-every 25
run bf16_px_e25 --seed 333 --dtype bf16 --seeds 8 --masked --prog-step 5 \
    --select-by pixel --eval-every 25
run px_s501 --seed 501 --seeds 8 --masked --prog-step 5 \
    --select-by pixel --eval-every 25
echo PHASE5_DONE
