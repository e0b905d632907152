#!/bin/sh
# Round-5 TPU queue, part 2: Kuramoto controls, consensus-selector probe,
# bf16 warm-negative report card, quantile-budget cost table, worst-
# trajectory diagnosis, wide-field MFU. Serialized: one TPU process at a
# time.
set -e
cd "$(dirname "$0")/.."

echo "=== kuramoto controls (2x2 completion) ==="
sh benchmarks/run_r5_kuramoto_controls.sh

echo "=== kuramoto constructive warm diagnostic ==="
timeout 3000 python benchmarks/diag_kuramoto_constructive.py \
  2>&1 | tee benchmarks/diag_kuramoto_constructive.log | tail -4

echo "=== consensus selector probe (six populations) ==="
timeout 3000 python benchmarks/selector_generic_probe.py \
  2>&1 | tee benchmarks/selector_probe_r5.log | tail -8

echo "=== bf16 warm-negative per-seed report card ==="
timeout 1200 python benchmarks/drivers_fc_winner_extract.py \
  --tag fc_ws_bf16_pop8_px_both --dtype bf16 --seed 333 \
  --population benchmarks/output_quality/fc_ws_bf16_pop8_px_both/population.npz \
  --select-by pixel-composite --artifact fc_ws_bf16_px_both_winner.npz \
  2>&1 | tee benchmarks/fc_ws_bf16_extract.log | tail -12

echo "=== autosize cost table with quantile rows ==="
timeout 3000 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  2>&1 | tee benchmarks/autosize_epoch_cost_r5.log | tail -10

echo "=== worst-trajectory diagnosis ==="
timeout 1200 python benchmarks/diag_worst_traj.py \
  2>&1 | tee benchmarks/diag_worst_traj.log | tail -15

echo "=== wide-field MFU ==="
timeout 2400 python benchmarks/mfu_wide.py \
  2>&1 | tee benchmarks/mfu_wide.log | tail -8

echo QUEUE2_DONE
