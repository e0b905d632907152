#!/bin/bash
# Quality sweep round C: polish phase, longer runs, finer dynamics, seeds.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/output_quality
run() {
  tag=$1; shift
  echo "=== $tag $(date +%H:%M:%S) ==="
  python benchmarks/quality_goku.py --tag "$tag" "$@" \
    > "benchmarks/output_quality/$tag.log" 2>&1
  python - "$tag" <<'EOF'
import json, sys
d = json.load(open(f"benchmarks/quality_goku_{sys.argv[1]}.json"))
b = d["best"]
print(f"  corr {b['angle_corr_median']:+.3f} (min {b['angle_corr_min']:+.2f})"
      f"  Lerr {b['length_abs_err_median']:.3f}"
      f"  mse {b['val_recon_mse_per_pixel']:.4f}  val {d['best_val_loss']:.2f}")
EOF
}

run s100_pol   --seed 1 --seq-len 100 --epochs 3000 --dispatch 1 --polish 1500
run s100_6000  --seed 1 --seq-len 100 --epochs 6000 --dispatch 1
run s100_sub2  --seed 1 --seq-len 100 --epochs 3000 --dispatch 1 --substeps 2
run s100_3     --seed 3 --seq-len 100 --epochs 3000 --dispatch 1
run s100_4     --seed 4 --seq-len 100 --epochs 3000 --dispatch 1
echo SWEEP_C_DONE
