#!/bin/sh
# Kuramoto phase 2: the 2000-epoch populations were still descending
# (vals 0.62-0.97 and falling) -- train 3x longer on the two beta=1e-5
# variants, 8 seeds for tape robustness.
set -e
cd "$(dirname "$0")/.."
run() {
  tag=$1; shift
  echo "=== kuramoto $tag ==="
  timeout 6000 python benchmarks/quality_kuramoto.py --tag "$tag" "$@" \
    2>&1 | tee "benchmarks/qk_${tag}.log" | tail -3
}
run kuramoto_spread05_b1e5_6k --seeds 8 --epochs 6000 --omega-spread 0.5 --end-beta 1e-5
run kuramoto_eq_b1e5_6k --seeds 8 --epochs 6000 --end-beta 1e-5
echo LONG_DONE
