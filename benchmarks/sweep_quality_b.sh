#!/bin/bash
# Quality sweep round B: longer windows (seq_len 100 -> sharper
# pendulum-length signal via phase drift), longer training, curriculum.
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
for lbl in ("best", "best_ctx"):
    b = d[lbl]
    print(f"  {lbl:9s} corr {b['angle_corr_median']:+.3f}  "
          f"Lerr {b['length_abs_err_median']:.3f}  "
          f"mse {b['val_recon_mse_per_pixel']:.4f}")
print(f"  val_loss {d['best_val_loss']:.2f}")
EOF
}

run s100_1    --seed 1   --seq-len 100 --epochs 3000 --dispatch 1
run s100_333  --seed 333 --seq-len 100 --epochs 3000 --dispatch 1
run s100_2    --seed 2   --seq-len 100 --epochs 3000 --dispatch 1
run s100prog  --seed 1   --seq-len 100 --epochs 3000 --dispatch 1 \
              --progressive --prog-duration 300 --start-seq-len 20
run s100_blk  --seed 1   --seq-len 100 --epochs 3000
run long4500  --seed 1   --epochs 4500 --dispatch 1
echo SWEEP_B_DONE
