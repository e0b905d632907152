#!/bin/bash
# Quality sweep round D: does the free-bits KL floor rescue the tapes that
# collapsed (prog recipe: block dispatch seed 1; per-epoch seed 2)?
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/output_quality
run() {
  tag=$1; shift
  echo "=== $tag $(date +%H:%M:%S) ==="
  python benchmarks/quality_goku.py --tag "$tag" --seq-len 100 \
    --epochs 3000 --progressive --prog-duration 300 --start-seq-len 20 \
    --free-bits 0.1 "$@" > "benchmarks/output_quality/$tag.log" 2>&1
  python - "$tag" <<'EOF'
import json, sys
d = json.load(open(f"benchmarks/quality_goku_{sys.argv[1]}.json"))
b = d["best"]
print(f"  corr {b['angle_corr_median']:+.3f} (min {b['angle_corr_min']:+.2f})"
      f"  Lerr {b['length_abs_err_median']:.3f}"
      f"  mse {b['val_recon_mse_per_pixel']:.4f}  val {d['best_val_loss']:.2f}")
EOF
}

run fb_blk_s1  --seed 1 --dispatch 25
run fb_s2      --seed 2 --dispatch 1
echo SWEEP_D_DONE
