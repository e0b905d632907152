#!/bin/bash
# Quality-parity sweep (VERDICT round-1 item 1): seeds x beta schedules x
# curriculum x dispatch granularity on the flagship GOKU pendulum workload.
# Runs sequentially (one TPU process at a time); the persistent JAX compile
# cache (.jax_cache) makes same-shape configs compile once. Full per-run
# logs land in benchmarks/output_quality/<tag>.log.
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
print(f"  val_loss {d['best_val_loss']:.2f}  corr {b['angle_corr_median']:+.3f}"
      f"  Lerr {b['length_abs_err_median']:.3f}  mse {b['val_recon_mse_per_pixel']:.4f}")
EOF
}

run epd1_333  --seed 333 --dispatch 1
run epd1_1    --seed 1   --dispatch 1
run ref1      --seed 1
run ref2      --seed 2
run beta01    --seed 333 --end-beta 0.1
run beta1e5   --seed 333 --start-beta 1e-5 --end-beta 1e-5
run prog      --seed 333 --progressive
run long3000  --seed 333 --epochs 3000
echo SWEEP_DONE
