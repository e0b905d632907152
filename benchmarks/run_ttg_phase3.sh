#!/bin/sh
# Time-to-gate phase 3 (after run_ttg_campaign.sh + masked5/masked5_vpe):
# steady-state (warm compile cache) number for the winning recipe, the
# population-with-early-prune recipe, and seed-robustness probes of the
# winner (time-to-gate is a property of the tape, not just the recipe —
# the masked5 winner must gate on more than one seed to be the headline).
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== ttg $tag ==="
  timeout 3600 python benchmarks/time_to_gate.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/ttg_${tag}.log" | tail -6
}

# Steady-state variant of the winner: first run populates .jax_cache,
# the second is the number.
run masked5_warm_prime --seed 1 --masked --prog-step 5 --cache warm
run masked5_warm --seed 1 --masked --prog-step 5 --cache warm

# Population: wide start (8 tapes), early prune to the 2 best-val
# replicas at epoch 500.
run pop8_prune --seed 1 --seeds 8 --prune-at 500 --prune-keep 2

# Winner-recipe robustness: two more seeds.
run masked5_s333 --seed 333 --masked --prog-step 5
run masked5_s7 --seed 7 --masked --prog-step 5
