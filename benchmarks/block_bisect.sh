#!/bin/bash
# Bisect the block-mode training-quality gap: same config (seq 100, seed 1,
# 400 epochs), only the dispatch granularity changes.
set -u
cd "$(dirname "$0")/.."
for d in 1 2 5 25; do
  tag="bisect_d$d"
  echo "=== $tag $(date +%H:%M:%S) ==="
  python benchmarks/quality_goku.py --tag "$tag" --seq-len 100 --seed 1 \
    --epochs 400 --dispatch "$d" \
    > "benchmarks/output_quality/$tag.log" 2>&1
  python - "$tag" <<'EOF'
import json, sys
d = json.load(open(f"benchmarks/quality_goku_{sys.argv[1]}.json"))
print(f"  val_loss {d['best_val_loss']:.2f}  "
      f"trace {d['val_loss_trace'][::4]}")
EOF
done
echo BISECT_DONE
