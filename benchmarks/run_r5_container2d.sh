#!/bin/sh
# Round-5 TPU queue v4 (after the second tunnel outage, 00:57-01:22):
# final-code adaptive-SDE rows first (masked VBT + depth-cap autosizing),
# then wide-field MFU, then the spendulum regen + probe merge.
cd "$(dirname "$0")/.."

stage() { echo "=== $1 (start $(date +%H:%M:%S)) ==="; }

stage "adaptive-SDE autosized rows, final code (merge)"
timeout 1800 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  --subset sdefinal \
  2>&1 | tee benchmarks/autosize_sdefinal.log | tail -8
echo "exit=$?"

stage "wide-field MFU"
timeout 2400 python benchmarks/mfu_wide.py \
  2>&1 | tee benchmarks/mfu_wide.log | tail -8
echo "exit=$?"

stage "spendulum fb pop4 regen"
timeout 2400 python benchmarks/quality_variants.py --workload spendulum \
  --seeds 4 --free-bits 0.1 --epochs 3000 --tag spendulum_fb_pop4_r4 \
  2>&1 | tee benchmarks/qv_spendulum_fb_pop4_r5.log | tail -3
echo "exit=$?"

stage "consensus selector probe: spendulum (merge)"
timeout 1500 python benchmarks/selector_generic_probe.py \
  --pop spendulum_fb_pop4 \
  2>&1 | tee benchmarks/selector_probe_r5_sp.log | tail -6
echo "exit=$?"

stage "no-autosize adaptive-SDE row, final code (merge)"
timeout 1800 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  --subset sde \
  2>&1 | tee benchmarks/autosize_sde_noauto.log | tail -8
echo "exit=$?"

echo "CONTAINER2D_QUEUE_DONE $(date +%H:%M:%S)"
