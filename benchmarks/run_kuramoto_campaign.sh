#!/bin/sh
# Kuramoto identifiability campaign (round 4, VERDICT item 2): the VdP
# playbook applied to the transform-hook workload. Supervised ceilings
# (quality_kuramoto.py --probe): identical-omega data carries omega at
# R^2 0.97 (model record: corr -0.10 -> recipe/objective at fault), K at
# 0.54. Runs, in order:
#   1. identical-omega, beta ceiling 1e-5 (the reference's own
#      hard-identification setting) - is 0.01 still too much KL?
#   2. omega-spread 0.5 (the classic Kuramoto: distinct oscillators,
#      locking transition inside the K range), beta 0.01
#   3. omega-spread 0.5, beta 1e-5 (if 1 shows the tiny-beta effect)
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== kuramoto $tag ==="
  timeout 3000 python benchmarks/quality_kuramoto.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/qk_${tag}.log" | tail -3
}

run kuramoto_eq_b1e5_pop4 --seeds 4 --epochs 2000 --end-beta 1e-5
run kuramoto_spread05_pop4 --seeds 4 --epochs 2000 --omega-spread 0.5
run kuramoto_spread05_b1e5_pop4 --seeds 4 --epochs 2000 --omega-spread 0.5 --end-beta 1e-5
echo CAMPAIGN_DONE
