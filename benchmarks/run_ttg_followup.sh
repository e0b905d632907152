#!/bin/sh
# Time-to-gate follow-up recipes (run after run_ttg_campaign.sh).
#
# The campaign's masked run used --prog-step 1 (the reference's exact
# one-length-per-epoch curriculum) and showed that the CURRICULUM SHAPE
# changes the tape: seed 1 lands in a recon-warped chart there. The
# apples-to-apples compile-cost ablation is masked + step 5 — identical
# math to the baseline curriculum (test_masked_curriculum), one compiled
# program instead of ~20.
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== ttg $tag ==="
  timeout 3600 python benchmarks/time_to_gate.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/ttg_${tag}.log" | tail -6
}

# 6. Masked single-compile ablation of the baseline (same length schedule,
#    one program): isolates pure compile cost from the 664 s baseline.
run masked5 --seed 1 --masked --prog-step 5

# 7. + per-epoch val (6x fewer full-val forwards; selection only coarsens
#    to epoch granularity).
run masked5_vpe --seed 1 --masked --prog-step 5 --val-every-epoch

# 8. Steady-state (warm compile cache) variant of the best recipe: run
#    twice, the first populates .jax_cache, the second is the number.
run masked5_warm_prime --seed 1 --masked --prog-step 5 --cache warm
run masked5_warm --seed 1 --masked --prog-step 5 --cache warm
