#!/bin/sh
# Round-5 TPU queue for the fresh container: regenerate the gitignored
# populations (records already committed; regens are deterministic and were
# verified bit-identical last session), then run the round-5 measurements
# that never got to run: the consensus-selector probe, the bf16
# warm-negative extract, the quantile-budget cost table, the
# worst-trajectory diagnosis, and the wide-field MFU row. Serialized: one
# TPU process at a time. No set -e: a failed stage must not starve the rest.
cd "$(dirname "$0")/.."

stage() {
  echo "=== $1 (start $(date +%H:%M:%S)) ==="
}

stage "f32 warm-start composite regen (~6 min)"
mkdir -p benchmarks/output_quality/fc_ws_pop8_px_both
timeout 1200 python benchmarks/time_to_gate.py --tag fc_ws_pop8_px_both \
  --epochs 3000 --seed 1 --seeds 8 --masked --prog-step 5 \
  --select-by pixel-composite --gate-metric both --eval-every 25 \
  --warm-start \
  --save-population benchmarks/output_quality/fc_ws_pop8_px_both/population.npz \
  2>&1 | tee benchmarks/fc_ws_pop8_px_both_regen.log | tail -4
echo "exit=$?"

stage "autosize cost table with quantile rows (~15 min)"
timeout 3000 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  2>&1 | tee benchmarks/autosize_epoch_cost_r5.log | tail -12
echo "exit=$?"

stage "kuramoto eq b1e5 pop4 regen (~11 min)"
timeout 3000 python benchmarks/quality_kuramoto.py --tag kuramoto_eq_b1e5_pop4 \
  --seeds 4 --epochs 2000 --end-beta 1e-5 \
  2>&1 | tee benchmarks/qk_kuramoto_eq_b1e5_pop4.log | tail -3
echo "exit=$?"

stage "kuramoto spread05 pop4 regen (~10 min)"
timeout 3000 python benchmarks/quality_kuramoto.py --tag kuramoto_spread05_pop4 \
  --seeds 4 --epochs 2000 --omega-spread 0.5 \
  2>&1 | tee benchmarks/qk_kuramoto_spread05_pop4.log | tail -3
echo "exit=$?"

stage "vdp mu4 pop8 regen (~16 min)"
timeout 3000 python benchmarks/quality_vdp.py --tag vdp_mu4_pop8_r4 \
  --mu-max 4 --end-beta 0.01 --n-cycle 1 --seeds 8 --epochs 4000 \
  2>&1 | tee benchmarks/qvdp_mu4_pop8_r5.log | tail -3
echo "exit=$?"

stage "spendulum fb pop4 regen (~30 min)"
timeout 3600 python benchmarks/quality_variants.py --workload spendulum \
  --seeds 4 --free-bits 0.1 --epochs 3000 --tag spendulum_fb_pop4_r4 \
  2>&1 | tee benchmarks/qv_spendulum_fb_pop4_r5.log | tail -3
echo "exit=$?"

stage "bf16 warm-start composite regen (~19 min)"
mkdir -p benchmarks/output_quality/fc_ws_bf16_pop8_px_both
timeout 3000 python benchmarks/time_to_gate.py --tag fc_ws_bf16_pop8_px_both \
  --epochs 3000 --seed 333 --seeds 8 --masked --prog-step 5 --dtype bf16 \
  --select-by pixel-composite --gate-metric both --eval-every 25 \
  --warm-start \
  --save-population benchmarks/output_quality/fc_ws_bf16_pop8_px_both/population.npz \
  2>&1 | tee benchmarks/fc_ws_bf16_pop8_px_both.log | tail -4
echo "exit=$?"

stage "consensus selector probe, six populations (~30 min)"
timeout 3600 python benchmarks/selector_generic_probe.py \
  2>&1 | tee benchmarks/selector_probe_r5.log | tail -10
echo "exit=$?"

stage "bf16 warm-negative per-seed report card"
timeout 1200 python benchmarks/drivers_fc_winner_extract.py \
  --tag fc_ws_bf16_pop8_px_both --dtype bf16 --seed 333 \
  --population benchmarks/output_quality/fc_ws_bf16_pop8_px_both/population.npz \
  --select-by pixel-composite --artifact fc_ws_bf16_px_both_winner.npz \
  2>&1 | tee benchmarks/fc_ws_bf16_extract.log | tail -12
echo "exit=$?"

stage "worst-trajectory diagnosis"
timeout 1200 python benchmarks/diag_worst_traj.py \
  2>&1 | tee benchmarks/diag_worst_traj.log | tail -15
echo "exit=$?"

stage "wide-field MFU"
timeout 2400 python benchmarks/mfu_wide.py \
  2>&1 | tee benchmarks/mfu_wide.log | tail -8
echo "exit=$?"

echo "CONTAINER2_QUEUE_DONE $(date +%H:%M:%S)"
