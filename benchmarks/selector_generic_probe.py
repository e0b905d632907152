"""Probe of the DOMAIN-AGNOSTIC library selector across workloads.

latentdiffeq.train.selectors.observation_composite_scores is the library's
answer to the round-3 finding that every generic selector fails mid-anneal
while the pixel-angle observable (domain code — renderer inversion) is
exact: it scores replicas from observations alone by beyond-context
temporal agreement conditioned on in-context temporal agreement (see the
module docstring for the three measured lessons it encodes). This probe
measures how well that transfers across every population with committed
per-replica ground truth:

- pendulum f32 / bf16: the composite-forecast-campaign populations
  (time_to_gate.py --save-population), truth = angle corr vs true latent.
- spendulum: free-bits pop4 (quality_variants --workload spendulum),
  truth = drift-twin angle corr.
- vdp: tiny-beta pop8 (quality_vdp), truth = state corr (mu_corr also
  recorded).
- kuramoto: the transform-hook workload (quality_kuramoto), truth =
  permutation-matched state corr.

For each population the probe reports per-replica (in-context agreement,
forecast agreement, composite score, truth) for live AND best-carry
weights, the Spearman rank correlation of the composite score vs truth
over live replicas, and whether the full selection protocol
(argmax over live+best, MultiSeedTrainer.select semantics) picks a
top-1-quality replica. Results merge by population name into
selector_generic_probe.json.

Usage: python benchmarks/selector_generic_probe.py [--pop NAME ...] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                splitobs)
from latentdiffeq.train.selectors import (_pop_decode,  # noqa: E402
                                          combine_composite,
                                          observation_consensus_scores,
                                          observation_forecast_scores,
                                          temporal_agreement)

OUT = os.path.join(ROOT, "benchmarks", "selector_generic_probe.json")
CTX = 50


def spearman(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    m = np.isfinite(a) & np.isfinite(b)
    if m.sum() < 3:
        return float("nan")
    ra = np.argsort(np.argsort(a[m])).astype(np.float64)
    rb = np.argsort(np.argsort(b[m])).astype(np.float64)
    return float(np.corrcoef(ra, rb)[0, 1])


# --------------------------------------------------------------------------
# population registry: name -> dict(load) returning everything needed
# --------------------------------------------------------------------------

def _pendulum(dtype_name):
    from create_data import load_or_generate
    from pendulum import Pendulum
    from quality_goku import evaluate
    from latentdiffeq import make_options
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

    def init_fn(k):
        e, d = default_layers(k, GOKUBasic(), x.shape[-1], diffeq,
                              dtype=dtype)
        return LatentDiffEqModel.build(GOKUBasic(), e, d)

    def truth(model):
        m = evaluate(model, val_set, val_latent, val_ps, 0.05)
        return {"truth": m["angle_corr_median"],
                "L_err": m["length_abs_err_median"]}

    return init_fn, val_set, 0.05, truth


def _spendulum():
    from create_data import load_or_generate
    from quality_goku import evaluate
    from quality_variants import build_model_keyed, drift_twin

    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)

    def init_fn(k):
        return build_model_keyed("spendulum", x.shape[-1], k)

    def truth(model):
        m = evaluate(drift_twin(model), val_set, val_latent, val_ps, 0.05)
        return {"truth": m["angle_corr_median"],
                "L_err": m["length_abs_err_median"]}

    return init_fn, val_set, 0.05, truth


def _vdp(mu_max=4.0):
    import quality_vdp
    from train_vdp import make_data

    x, z, mus, vdp = make_data(mu_max=mu_max)
    _, val_set = splitobs(x, 0.9)
    _, val_z = splitobs(z, 0.9)
    _, val_mus = splitobs(mus, 0.9)

    def init_fn(k):
        return quality_vdp.build_model_keyed(x.shape[-1], k, vdp)

    def truth(model):
        m = quality_vdp.evaluate(model, val_set, val_z, val_mus)
        return {"truth": m["state_corr_median"], "mu_corr": m["mu_corr"]}

    return init_fn, val_set, 0.1, truth


def _kuramoto(omega_spread=0.0, k_max=2.0):
    import quality_kuramoto
    from train_kuramoto import make_data

    x, z_sin, thetas, kur = make_data(k_range=(0.2, k_max),
                                      omega_spread=omega_spread)
    _, val_set = splitobs(x, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)
    _, val_thetas = splitobs(thetas, 0.9)

    def init_fn(k):
        return quality_kuramoto.build_model_keyed(x.shape[-1], k, kur)

    def truth(model):
        m = quality_kuramoto.evaluate(model, val_set, val_zsin, val_thetas)
        return {"truth": m["state_corr_median"],
                "omega_corr": m["omega_corr"], "k_corr": m["k_corr"]}

    return init_fn, val_set, 0.1, truth


POPS = {
    # name -> (loader, population subdir, seeds)
    # round-5 regens (populations are gitignored; round 4's originals are
    # gone): the pendulum populations are the round-5 WARM-STARTED
    # composite-campaign populations (time_to_gate.py --warm-start) — same
    # truth protocol, fresh committed records
    "fc_ws_pop8_px_both": (lambda: _pendulum("f32"), "fc_ws_pop8_px_both",
                           list(range(1, 9))),
    "fc_ws_bf16_pop8_px_both": (lambda: _pendulum("bf16"),
                                "fc_ws_bf16_pop8_px_both",
                                list(range(333, 341))),
    "spendulum_fb_pop4": (_spendulum, "spendulum_fb_pop4_r4",
                          [1, 2, 3, 4]),
    "vdp_mu4_pop8": (lambda: _vdp(4.0), "vdp_mu4_pop8_r4",
                     list(range(1, 9))),
    "kuramoto_spread_pop4": (lambda: _kuramoto(0.5),
                             "kuramoto_spread05_pop4", [1, 2, 3, 4]),
    "kuramoto_eq_pop4": (lambda: _kuramoto(0.0),
                         "kuramoto_eq_b1e5_pop4", [1, 2, 3, 4]),
}


def probe(name: str) -> dict:
    loader, subdir, seeds = POPS[name]
    path = os.path.join(ROOT, "benchmarks", "output_quality", subdir,
                        "population.npz")
    if not os.path.exists(path):
        print(f"[skip] {name}: {path} missing")
        return None
    init_fn, val_set, dt, truth_fn = loader()
    cfg = TrainConfig(seq_len=val_set.shape[1], dt=dt, save_best=False)
    ms = MultiSeedTrainer(init_fn, cfg, seeds)
    ms.restore(path)

    xv = jnp.asarray(val_set)
    t = jnp.arange(xv.shape[1], dtype=jnp.float32) * dt

    rows = []
    score_sets = {}
    for side, stacked in (("live", ms.models),
                          ("best", ms.stacked_best_models)):
        xh_full = np.asarray(_pop_decode(stacked, xv, t))
        in_ctx = np.asarray([temporal_agreement(x, val_set)
                             for x in xh_full])
        fc = observation_forecast_scores(stacked, val_set, dt, CTX)
        comp = combine_composite(in_ctx, fc)
        # cross-replica consensus (round-5 probe, VERDICT r4 item 3):
        # raw = median pairwise beyond-context agreement with the OTHER
        # replicas; cond = the same gated by in-context data agreement
        cons = observation_consensus_scores(stacked, val_set, dt, CTX)
        cons_comp = combine_composite(in_ctx, cons)
        score_sets[side] = {"in_ctx": in_ctx, "fc": fc, "comp": comp,
                            "cons": cons, "cons_comp": cons_comp}

    truths = {"live": [], "best": []}
    for i in range(ms.n_seeds):
        t_live = truth_fn(ms.seed_model(i))
        t_best = truth_fn(ms.best_seed_model(i))
        truths["live"].append(t_live)
        truths["best"].append(t_best)
        rows.append({
            "seed": ms.seeds[i],
            "in_ctx_live": round(float(score_sets["live"]["in_ctx"][i]), 4),
            "fc_live": round(float(score_sets["live"]["fc"][i]), 4),
            "composite_live": round(float(score_sets["live"]["comp"][i]), 4),
            "consensus_live": round(float(score_sets["live"]["cons"][i]), 4),
            "consensus_comp_live": round(
                float(score_sets["live"]["cons_comp"][i]), 4),
            "truth_live": round(t_live["truth"], 4),
            "composite_best": round(float(score_sets["best"]["comp"][i]), 4),
            "consensus_best": round(float(score_sets["best"]["cons"][i]), 4),
            "consensus_comp_best": round(
                float(score_sets["best"]["cons_comp"][i]), 4),
            "truth_best": round(t_best["truth"], 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    tl = np.array([r["truth_live"] for r in rows])
    tb = np.array([r["truth_best"] for r in rows])

    def protocol(score_key):
        """Spearman + the full selection protocol (argmax over live AND
        best) for one scorer."""
        sl = score_sets["live"][score_key]
        sb = score_sets["best"][score_key]
        overall = np.maximum(sl, sb)
        i = int(np.argmax(overall))
        picked_from_best = bool(sb[i] >= sl[i])
        picked_truth = tb[i] if picked_from_best else tl[i]
        best_truth = float(max(tl.max(), tb.max()))
        return {
            "spearman_live": round(spearman(sl, tl), 4),
            "spearman_best": round(spearman(sb, tb), 4),
            "picked_seed": ms.seeds[i],
            "picked_from_best": picked_from_best,
            "picked_truth": round(float(picked_truth), 4),
            "best_truth": round(best_truth, 4),
            "top1": bool(picked_truth >= best_truth - 0.02),
        }

    summary = protocol("comp")
    consensus = {"raw": protocol("cons"),
                 "conditioned": protocol("cons_comp")}
    print(name, json.dumps(summary), flush=True)
    print(name, "consensus", json.dumps(consensus), flush=True)
    return {"rows": rows, "summary": summary, "consensus": consensus,
            "extra_truth_keys": sorted(set(truths["live"][0])
                                       - {"truth"})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", nargs="*", default=list(POPS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in args.pop:
        r = probe(name)
        if r is not None:
            results[name] = r
    done = [n for n in results if isinstance(results[n], dict)
            and "summary" in results[n]]

    def tally(get):
        return sum(1 for n in done
                   if (s := get(results[n])) is not None
                   and (s["top1"] or s["spearman_live"] >= 0.8))

    results["_overall"] = {
        "populations_probed": done,
        "top1_or_spearman08": tally(lambda r: r["summary"]),
        "consensus_raw_top1_or_spearman08": tally(
            lambda r: r.get("consensus", {}).get("raw")),
        "consensus_cond_top1_or_spearman08": tally(
            lambda r: r.get("consensus", {}).get("conditioned")),
        "criterion": "top-1 (within 0.02 of best truth) or "
                     "Spearman(live) >= 0.8",
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["_overall"], indent=2))


if __name__ == "__main__":
    main()
