"""Extract the pixel-FORECAST-selected winner from a time-to-forecast
population checkpoint, evaluate every replica against ground truth (the
selector's report card, in-context AND beyond-context), and commit the
winner weights as an artifact.

Counterpart of drivers_ttg_winner_extract.py for the forecast campaign
(time_to_gate.py --gate-metric forecast --select-by pixel-forecast):
restore the saved population, re-run the SAME unsupervised selection
protocol (MultiSeedTrainer.select over the pixel-forecast observable —
best-carry and live weights, observations only), and record how it
compares with the supervised per-replica truth.

Usage:
    python benchmarks/drivers_fc_winner_extract.py \
        --population /tmp/fc_pop8_population.npz --tag fc_pop8_px

reference: the extrapolation the reference only visualizes
(model_train.jl:58,244-290 — vis_len=60 > seq_len=50), made a measured,
selectable capability.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "examples/pendulum")
sys.path.insert(0, "benchmarks")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quality_goku import evaluate, forecast_eval  # noqa: E402
from pixel_observable import (pixel_angles,  # noqa: E402
                              population_pixel_composite_scores,
                              population_pixel_forecast_scores)
from create_data import load_or_generate  # noqa: E402
from pendulum import Pendulum  # noqa: E402
from latentdiffeq import make_options  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                splitobs)

ap = argparse.ArgumentParser()
ap.add_argument("--tag", default="fc_pop8_px",
                help="campaign tag: updates ttg_<tag>.json")
ap.add_argument("--population", required=True,
                help="save_population() file of the campaign run")
ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
ap.add_argument("--seed", type=int, default=1,
                help="first seed of the population (seeds seed..seed+7)")
ap.add_argument("--context", type=int, default=50)
ap.add_argument("--select-by", default="pixel-forecast",
                choices=["pixel-forecast", "pixel-composite"],
                help="the campaign's selection protocol (time_to_gate.py "
                "--select-by): 'pixel-composite' = forecast score among "
                "replicas clearing the in-context pixel bar (the "
                "--gate-metric both recipe)")
ap.add_argument("--artifact", default="fc_px_winner.npz")
args = ap.parse_args()

RECORD = f"benchmarks/ttg_{args.tag}.json"
ARTIFACT = os.path.join("benchmarks/artifacts", args.artifact)

latent, u0s, ps, frames = load_or_generate()
x = frames.reshape(frames.shape[0], frames.shape[1], -1)
train_set, val_set = splitobs(x, 0.9)
_, val_latent = splitobs(latent, 0.9)
_, val_ps = splitobs(ps, 0.9)

# exact config of the campaign run (ttg_<tag>.json config)
diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32


def init_fn(k):
    enc, dec = default_layers(k, GOKUBasic(), x.shape[-1], diffeq,
                              dtype=dtype)
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


cfg = TrainConfig(
    lr=1e-3, decay=1e-3, batch_size=64, seq_len=100, epochs=3000,
    seed=args.seed, start_beta=0.0, end_beta=1.0, n_cycle=4, ratio=0.9,
    progressive_training=True, prog_training_duration=300, start_seq_len=20,
    prog_seq_len_step=5, masked_curriculum=True, epochs_per_dispatch=25,
    save_best=False)
tr = MultiSeedTrainer(init_fn, cfg, list(range(args.seed, args.seed + 8)))
tr.restore(args.population)
print(f"restored population @ epoch {tr.epoch}, seeds {tr.seeds}",
      flush=True)

# the unsupervised selection protocol, verbatim from time_to_gate.py
th_obs = pixel_angles(val_set)
if args.select_by == "pixel-composite":
    score_fn = lambda m: population_pixel_composite_scores(  # noqa: E731
        m, val_set, th_obs, cfg.dt, args.context)
else:
    score_fn = lambda m: population_pixel_forecast_scores(  # noqa: E731
        m, val_set, th_obs, cfg.dt, args.context)
winner, info = tr.select(score_fn)
i, use_best = info["index"], info["from_best"]
sl = np.asarray(info["scores_live"])
sb = np.asarray(info["scores_best"])

# supervised report card: what the selector saw vs the ground truth
per_seed = []
for j in range(tr.n_seeds):
    mb = evaluate(tr.best_seed_model(j), val_set, val_latent, val_ps, cfg.dt)
    fb = forecast_eval(tr.best_seed_model(j), val_set, val_latent, cfg.dt,
                       args.context)
    per_seed.append({
        "seed": tr.seeds[j],
        "pixel_fc_score_best": round(float(sb[j]), 4),
        "pixel_fc_score_live": round(float(sl[j]), 4),
        "true_fc_corr_best": round(fb["forecast_corr_beyond_median"], 4),
        "true_corr_best": round(mb["angle_corr_median"], 4),
        "true_L_err_best": round(mb["length_abs_err_median"], 4)})
    print(json.dumps(per_seed[-1]), flush=True)

m = evaluate(winner, val_set, val_latent, val_ps, cfg.dt)
fc = forecast_eval(winner, val_set, val_latent, cfg.dt, args.context)
print(json.dumps({"winner_seed": tr.seeds[i], "carry": use_best,
                  "forecast_corr_beyond_median":
                      fc["forecast_corr_beyond_median"],
                  "angle_corr_median": m["angle_corr_median"],
                  "length_abs_err_median": m["length_abs_err_median"]},
                 indent=1), flush=True)

tr.save_replica(ARTIFACT, i, from_best=use_best)

rec = json.load(open(RECORD))
rec["winner"] = {"seed": tr.seeds[i], "from_best": use_best,
                 "selection": f"{args.select_by} argmax over best+live",
                 "artifact": ARTIFACT, "eval": {**m, **fc}}
rec["per_seed"] = per_seed
json.dump(rec, open(RECORD, "w"), indent=2)
print("record updated:", RECORD, flush=True)
