#!/bin/sh
# Round-5 TPU queue v3: corrected vdp flags (--seq-len 100 --progressive —
# the committed record's actual config; run_r5_queue.sh had stale flags),
# then the probe + remaining measurements.
cd "$(dirname "$0")/.."

stage() { echo "=== $1 (start $(date +%H:%M:%S)) ==="; }

stage "vdp mu4 pop8 regen (faithful flags)"
timeout 2000 python benchmarks/quality_vdp.py --tag vdp_mu4_pop8_r4 \
  --mu-max 4 --end-beta 0.01 --n-cycle 1 --seeds 8 --epochs 4000 \
  --seq-len 100 --progressive \
  2>&1 | tee benchmarks/qvdp_mu4_pop8_r5.log | tail -3
echo "exit=$?"

stage "adaptive-SDE cost rows re-measured post vbt fix (merge)"
timeout 1500 python benchmarks/autosize_epoch_cost.py --seeds 8 --epochs 150 \
  --subset sde \
  2>&1 | tee benchmarks/autosize_sde_rows.log | tail -8
echo "exit=$?"

stage "consensus selector probe (available populations)"
timeout 3000 python benchmarks/selector_generic_probe.py \
  --pop fc_ws_pop8_px_both kuramoto_spread_pop4 kuramoto_eq_pop4 vdp_mu4_pop8 \
  2>&1 | tee benchmarks/selector_probe_r5.log | tail -10
echo "exit=$?"

stage "worst-trajectory diagnosis"
timeout 1200 python benchmarks/diag_worst_traj.py \
  2>&1 | tee benchmarks/diag_worst_traj.log | tail -15
echo "exit=$?"

stage "wide-field MFU"
timeout 2400 python benchmarks/mfu_wide.py \
  2>&1 | tee benchmarks/mfu_wide.log | tail -8
echo "exit=$?"

stage "spendulum fb pop4 regen (droppable if the round ends)"
timeout 2400 python benchmarks/quality_variants.py --workload spendulum \
  --seeds 4 --free-bits 0.1 --epochs 3000 --tag spendulum_fb_pop4_r4 \
  2>&1 | tee benchmarks/qv_spendulum_fb_pop4_r5.log | tail -3
echo "exit=$?"

stage "consensus selector probe: spendulum (merge)"
timeout 1500 python benchmarks/selector_generic_probe.py \
  --pop spendulum_fb_pop4 \
  2>&1 | tee benchmarks/selector_probe_r5_sp.log | tail -6
echo "exit=$?"

echo "CONTAINER2C_QUEUE_DONE $(date +%H:%M:%S)"
