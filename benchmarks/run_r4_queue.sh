#!/bin/sh
# Round-4 TPU queue after the Kuramoto campaign: autosize cost table +
# population regens for the generic-selector probe (populations are
# gitignored; the probe JSON is the committed record).
set -e
cd "$(dirname "$0")/.."

echo "=== autosize epoch cost ==="
timeout 3000 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  2>&1 | tee benchmarks/autosize_epoch_cost.log | tail -8

echo "=== spendulum fb pop4 regen (probe population) ==="
timeout 3000 python benchmarks/quality_variants.py --workload spendulum \
  --seeds 4 --free-bits 0.1 --epochs 3000 --tag spendulum_fb_pop4_r4 \
  2>&1 | tee benchmarks/qv_spendulum_fb_pop4_r4.log | tail -3

echo "=== vdp mu4 pop8 regen (probe population) ==="
timeout 3000 python benchmarks/quality_vdp.py --tag vdp_mu4_pop8_r4 \
  --mu-max 4 --end-beta 0.01 --n-cycle 1 --seeds 8 --epochs 4000 \
  2>&1 | tee benchmarks/qvdp_mu4_pop8_r4.log | tail -3

echo QUEUE_DONE
