"""Prune the adaptive-SDE population to the good-basin survivors and run
one more annealed cycle; select the winner by val ELBO at beta=1."""
import sys, json, time, dataclasses, os
sys.path.insert(0, "."); sys.path.insert(0, "examples/pendulum"); sys.path.insert(0, "benchmarks")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from quality_variants import build_model_keyed, standard_data, drift_twin
from quality_goku import evaluate
from latentdiffeq.train import MultiSeedTrainer, TrainConfig, splitobs
from latentdiffeq.train.losses import loss_batch

latent, u0s, ps, frames = standard_data()
x = frames.reshape(frames.shape[0], frames.shape[1], -1)
train_set, val_set = splitobs(x, 0.9)
_, val_latent = splitobs(latent, 0.9)
_, val_ps = splitobs(ps, 0.9)

outdir = "benchmarks/output_quality/spendulum_adaptive_final"
cfg = TrainConfig(epochs=3800, seed=1, free_bits=0.1, mask_failures=True,
                  progressive_training=True, prog_training_duration=300,
                  start_seq_len=20, seq_len=100, epochs_per_dispatch=25,
                  checkpoint_dir=outdir)
seeds = list(range(1, 9))
ms = MultiSeedTrainer(lambda k: build_model_keyed("spendulum_adaptive",
                                                  x.shape[-1], k), cfg, seeds)
ms.restore("benchmarks/output_quality/spendulum_adaptive_pop8b_polish/population.npz")
ms.prune([1, 3, 5, 6])          # seeds 2, 4, 6, 7 — the good basin
print("pruned to", ms.seeds, flush=True)

# one more annealed cycle: beta 0 -> 1 over 800 epochs, hold last 10%
ms.cfg = dataclasses.replace(cfg, start_beta=0.0, end_beta=1.0, n_cycle=1,
                             ratio=0.9, epochs=ms.epoch + 800)
ms._block_cache.clear()
t0 = time.perf_counter()
ms.fit(train_set, val_set, epochs=ms.epoch + 800, verbose=True)
total = time.perf_counter() - t0

xv = jnp.asarray(val_set)
t = jnp.arange(xv.shape[1], dtype=jnp.float32) * 0.05

@jax.jit
def elbo(m, xv):
    loss, met = loss_batch(m, xv, t, 1.0, variational=True,
                           key=jax.random.PRNGKey(0))
    return loss

# select by end-of-training val ELBO at beta=1 over LIVE models (the
# actual variational objective; beta=0-phase best carries favor
# recon-warped charts)
rows = []
for i in range(4):
    m_live = ms.seed_model(i)
    l = float(elbo(m_live, xv))
    md = evaluate(drift_twin(m_live), val_set, val_latent, val_ps, cfg.dt)
    rows.append({"seed": ms.seeds[i], "val_elbo_b1": round(l, 3),
                 "drift_corr": round(md["angle_corr_median"], 4),
                 "L_err": round(md["length_abs_err_median"], 4)})
    print(json.dumps(rows[-1]), flush=True)

j = int(np.argmin([r["val_elbo_b1"] for r in rows]))
winner = ms.seed_model(j)
m_st = evaluate(winner, val_set, val_latent, val_ps, cfg.dt)
m_dr = evaluate(drift_twin(winner), val_set, val_latent, val_ps, cfg.dt)
record = {"tag": "spendulum_adaptive_final",
          "workload": "spendulum_adaptive",
          "recipe": "pop8 (free-bits 0.1, mask-failures) 3000 annealed + "
                    "800 beta=0 polish + prune-to-4 + 800-epoch annealed "
                    "cycle; winner by val ELBO at beta=1",
          "continue_s": total,
          "winner_seed": ms.seeds[j], "per_seed": rows,
          "best": m_st, "best_drift": m_dr}
json.dump(record,
          open("benchmarks/quality_spendulum_adaptive_final.json", "w"),
          indent=2)
from latentdiffeq.train.checkpoint import save_checkpoint
from latentdiffeq.train import optim
opt = optim.adamw(cfg.lr, 0.9, 0.999, cfg.decay)
save_checkpoint("benchmarks/artifacts/spendulum_adaptive_winner.npz",
                {"model": jax.device_get(winner),
                 "opt_state": jax.device_get(
                     jax.tree_util.tree_map(lambda a: a[j], ms.opt_states)),
                 "key": ms.keys[j]},
                meta={"epoch": ms.epoch, "seed": ms.seeds[j],
                      "selection": "val_elbo_beta1"})
print(json.dumps({"winner": ms.seeds[j],
                  "drift_corr": m_dr["angle_corr_median"],
                  "L_err": m_dr["length_abs_err_median"]}, indent=1))
