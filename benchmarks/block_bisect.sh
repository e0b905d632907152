#!/bin/bash
# Bisect the block-mode training-quality gap on MATCHED beta schedules:
# the 3000-epoch schedule (the converged recipe's), trained 800 epochs,
# varying only dispatch granularity x seed. Good runs escape the ~29-loss
# posterior-collapse plateau well before epoch 800.
set -u
cd "$(dirname "$0")/.."
for seed in 1 2; do
  for d in 1 25; do
    tag="bis_s${seed}_d$d"
    echo "=== $tag $(date +%H:%M:%S) ==="
    python benchmarks/quality_goku.py --tag "$tag" --seq-len 100 \
      --seed "$seed" --epochs 3000 --train-epochs 800 --dispatch "$d" \
      > "benchmarks/output_quality/$tag.log" 2>&1
    python - "$tag" <<'EOF'
import json, sys
d = json.load(open(f"benchmarks/quality_goku_{sys.argv[1]}.json"))
print(f"  val_loss {d['best_val_loss']:.2f}  trace {d['val_loss_trace'][::4]}")
EOF
  done
done
echo BISECT_DONE
