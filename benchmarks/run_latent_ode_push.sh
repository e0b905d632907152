#!/bin/bash
# Round-3 LatentODE push (VERDICT r2 item 9): one serious recipe campaign.
# Four 4-seed population runs, serialized (one TPU process at a time):
#   d8   — latent_dim 8  (narrower bottleneck; does a smaller chart help the
#          global readout or hurt recon?)
#   d32  — latent_dim 32 (wider; reference default is 16, nODE.jl:13)
#   fb   — free-bits 0.2 at dim 16 (anti-collapse pressure on the posterior)
#   aug  — NODE(2, augment_dim=2): the reference's own commented alternate
#          (model_train_LatentODE.jl:36) — a 2-dim latent matching the true
#          state dim, augmented to 4 for the flow.
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
run() {
  echo "=== $* ==="
  $PY benchmarks/quality_variants.py --workload latent_ode --seeds 4 "$@"
}
run --latent-dim 8  --tag latent_ode_d8_pop4
run --latent-dim 32 --tag latent_ode_d32_pop4
run --free-bits 0.2 --tag latent_ode_fb_pop4
run --latent-dim 2 --augment-dim 2 --tag latent_ode_aug_pop4
echo CAMPAIGN_DONE
