"""Resume the interrupted adaptive-SDE population, finish the schedule,
polish at beta=0, evaluate (winner by val loss; per-seed diagnostics)."""
import sys, json, time, dataclasses
sys.path.insert(0, "."); sys.path.insert(0, "examples/pendulum"); sys.path.insert(0, "benchmarks")
import os
import jax
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from quality_variants import build_model_keyed, standard_data, drift_twin
from quality_goku import evaluate
from latentdiffeq.train import MultiSeedTrainer, TrainConfig, splitobs

latent, u0s, ps, frames = standard_data()
x = frames.reshape(frames.shape[0], frames.shape[1], -1)
train_set, val_set = splitobs(x, 0.9)
_, val_latent = splitobs(latent, 0.9)
_, val_ps = splitobs(ps, 0.9)

outdir = "benchmarks/output_quality/spendulum_adaptive_pop8b_polish"
cfg = TrainConfig(epochs=3000, seed=1, free_bits=0.1, mask_failures=True,
                  progressive_training=True, prog_training_duration=300,
                  start_seq_len=20, seq_len=100, epochs_per_dispatch=25,
                  start_beta=0.0, end_beta=1.0, n_cycle=4, ratio=0.9,
                  checkpoint_dir=outdir)
seeds = list(range(1, 9))
ms = MultiSeedTrainer(lambda k: build_model_keyed("spendulum_adaptive",
                                                  x.shape[-1], k),
                      cfg, seeds)
ms.restore("benchmarks/output_quality/spendulum_adaptive_pop8b/population.npz")
print("restored at epoch", ms.epoch, flush=True)
t0 = time.perf_counter()
ms.fit(train_set, val_set, verbose=True)          # finish 2783 -> 3000
# beta=0 polish of the whole population, best tracking continues
ms.cfg = dataclasses.replace(cfg, start_beta=0.0, end_beta=0.0,
                             epochs=ms.epoch + 800)
ms._block_cache.clear()
ms.fit(train_set, val_set, epochs=ms.epoch + 800, verbose=True)
total = time.perf_counter() - t0

per_seed = []
for i in range(8):
    m = jax.tree_util.tree_map(lambda a: a[i], ms._best["model"])
    md = evaluate(drift_twin(m), val_set, val_latent, val_ps, cfg.dt)
    per_seed.append({"seed": seeds[i],
                     "best_val": round(ms.per_seed_best_vals[i], 3),
                     "drift_corr": round(md["angle_corr_median"], 4),
                     "L_err": round(md["length_abs_err_median"], 4)})
    print(json.dumps(per_seed[-1]), flush=True)

best = ms.best_model
m_st = evaluate(best, val_set, val_latent, val_ps, cfg.dt)
m_dr = evaluate(drift_twin(best), val_set, val_latent, val_ps, cfg.dt)
record = {"tag": "spendulum_adaptive_pop8_polish",
          "workload": "spendulum_adaptive",
          "recipe": "pop8 free-bits 0.1 mask-failures, 3000 annealed "
                    "epochs (resumed from the interrupted run's "
                    "population.npz at 2782) + 800 beta=0 polish",
          "resume_s": total, "winner_seed": ms.best_seed,
          "per_seed_best_val": ms.per_seed_best_vals,
          "per_seed_drift": per_seed,
          "best_val_loss": ms.best_val_loss,
          "best": m_st, "best_drift": m_dr}
with open("benchmarks/quality_spendulum_adaptive_pop8_polish.json", "w") as f:
    json.dump(record, f, indent=2)
ms.save_best("benchmarks/artifacts/spendulum_adaptive_winner.npz")
print(json.dumps({"winner": ms.best_seed,
                  "drift_corr": m_dr["angle_corr_median"],
                  "L_err": m_dr["length_abs_err_median"]}, indent=1))
