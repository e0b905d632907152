#!/bin/sh
# Round-5 TPU queue, part 1: the bf16 warm-start composite campaign +
# population regens for the consensus-selector probe (populations are
# gitignored; probe JSON is the committed record). Serialized: one TPU
# process at a time.
set -e
cd "$(dirname "$0")/.."

echo "=== bf16 warm-start composite campaign ==="
mkdir -p benchmarks/output_quality/fc_ws_bf16_pop8_px_both
timeout 3000 python benchmarks/time_to_gate.py --tag fc_ws_bf16_pop8_px_both \
  --epochs 3000 --seed 333 --seeds 8 --masked --prog-step 5 --dtype bf16 \
  --select-by pixel-composite --gate-metric both --eval-every 25 \
  --warm-start \
  --save-population benchmarks/output_quality/fc_ws_bf16_pop8_px_both/population.npz \
  2>&1 | tee benchmarks/fc_ws_bf16_pop8_px_both.log | tail -4

echo "=== kuramoto eq b1e5 pop4 regen ==="
timeout 3000 python benchmarks/quality_kuramoto.py --tag kuramoto_eq_b1e5_pop4 \
  --seeds 4 --epochs 2000 --end-beta 1e-5 \
  2>&1 | tee benchmarks/qk_kuramoto_eq_b1e5_pop4.log | tail -3

echo "=== kuramoto spread05 pop4 regen ==="
timeout 3000 python benchmarks/quality_kuramoto.py --tag kuramoto_spread05_pop4 \
  --seeds 4 --epochs 2000 --omega-spread 0.5 \
  2>&1 | tee benchmarks/qk_kuramoto_spread05_pop4.log | tail -3

echo "=== spendulum fb pop4 regen ==="
timeout 3000 python benchmarks/quality_variants.py --workload spendulum \
  --seeds 4 --free-bits 0.1 --epochs 3000 --tag spendulum_fb_pop4_r4 \
  2>&1 | tee benchmarks/qv_spendulum_fb_pop4_r5.log | tail -3

echo "=== vdp mu4 pop8 regen ==="
timeout 3000 python benchmarks/quality_vdp.py --tag vdp_mu4_pop8_r4 \
  --mu-max 4 --end-beta 0.01 --n-cycle 1 --seeds 8 --epochs 4000 \
  2>&1 | tee benchmarks/qvdp_mu4_pop8_r5.log | tail -3

echo QUEUE_DONE
