"""Unsupervised model-selection probes over saved populations.

The open gap from the round-3 bf16 record (RESULTS.md): on the
deterministic pendulum, neither argmin best-val nor the beta=1 val ELBO
ranks the identifiable replica first — selection without latent ground
truth was unsolved. This probe evaluates selector candidates against the
per-replica ground truth (angle corr vs the true latent) on every saved
population checkpoint, WITHOUT retraining:

- ``best_val``: the best-carry validation loss (the round-2 default).
- ``elbo_b1``: val ELBO at beta=1 over live models (round-3 SDE protocol).
- ``fc_recon``: forecast reconstruction — encode the first 50 frames only,
  solve the latent DE over all 100, score recon on the full sequence.
  Physics rationale: GOKU's latent flows under the TRUE mechanistic ODE,
  so (z0, theta) charts that merely warp reconstruction inside the
  training window extrapolate badly past it.
- ``theta_icc`` (new): window consistency of the inferred mechanistic
  parameter — encode frames [0:50) and [50:100) independently and Pearson-
  correlate the two per-trajectory L_hat vectors across the 45 val
  trajectories. An identifiable chart reads the SAME length from any
  window (L is a property of the trajectory); a collapsed posterior reads
  noise; a warped chart reads window-phase-dependent values.
- ``pixel_corr`` (new): the domain observable read directly from PIXELS —
  the rendered pendulum's angle is recoverable from each observed frame
  (intensity-weighted centroid direction from the known pivot, the
  renderer geometry of create_data.py::render_frame), so corr(theta_hat,
  theta_pixel) is computable from observations alone, no latent ground
  truth. This is the "domain observable read directly from pixels" the
  bf16 selector shoot-out concluded was needed to separate consistent-
  but-warped charts from the true chart.

Populations probed (all committed checkpoints, seeds + ground truth known):
- bf16_pop8       — deterministic pendulum, bf16 (the failing case)
- pop8_polish     — deterministic pendulum, f32
- spendulum_adaptive_pop8b_polish — stochastic pendulum, adaptive SDE
- ttg_pop8_masked5_px — the time-to-gate flagship population at its gate
  epoch (mid-anneal; pixel_corr is the only top-1 selector there,
  Spearman 1.0 vs truth — RESULTS.md "the sixth selector closes it")

Results merge by population name into selector_probe.json, so probing a
subset (--pop) keeps committed rows whose checkpoints were cleaned.

Usage: python benchmarks/selector_probe.py [--pop NAME ...]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quality_goku import evaluate, pearson_rows  # noqa: E402
from quality_variants import build_model_keyed, drift_twin  # noqa: E402
# the pixel observable is domain code -- it inverts the pendulum renderer
# geometry -- and lives with the example; re-exported here for the probe
# harness and committed-record regeneration instructions
from pixel_observable import (pixel_angle_corr, pixel_angles,  # noqa: E402,F401
                              population_pixel_scores)


def theta_window_icc(model, val_set, dt: float, win: int = 50) -> float:
    """Window consistency of the inferred mechanistic parameter: Pearson
    across trajectories between L_hat read from frames [0:win) and from
    frames [win:2win). Identifiable charts read the same L from any
    window; collapsed posteriors read noise."""
    x = jnp.asarray(val_set)
    t = jnp.arange(win, dtype=jnp.float32) * dt

    @jax.jit
    def theta_of(m, xw):
        mu, _ = m.encoder(xw)
        (_, _, l_hat), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return l_hat[1].reshape(-1)

    la = np.asarray(theta_of(model, x[:, :win]), dtype=np.float64)
    lb = np.asarray(theta_of(model, x[:, win:2 * win]), dtype=np.float64)
    return float(pearson_rows(la[None, :], lb[None, :])[0])


def z_window_consistency(model, val_set, dt: float, win: int = 50,
                         lag: int = 25) -> float:
    """Overlapping-window latent-state consistency — the angle-chart
    probe. Encode frames [0:win) and [lag:lag+win) independently; both
    windows' decoded latent trajectories cover wall-clock frames
    [lag:win), where an identifiable chart must report the SAME state
    estimate (the latent angle is a property of the trajectory at a time
    point, not of the observation window). Collapsed posteriors replay a
    generic phase-blind trajectory, so the two windows' overlap segments
    are different slices of one canonical curve and decorrelate. Returns
    the median per-trajectory Pearson correlation over the overlap."""
    x = jnp.asarray(val_set)
    t = jnp.arange(win, dtype=jnp.float32) * dt

    @jax.jit
    def ztraj(m, xw):
        mu, _ = m.encoder(xw)
        (_, z, _), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return z

    za = np.asarray(ztraj(model, x[:, :win]), dtype=np.float64)
    zb = np.asarray(ztraj(model, x[:, lag:lag + win]), dtype=np.float64)
    r = pearson_rows(za[:, lag:win, 0], zb[:, :win - lag, 0])
    return float(np.median(r))



def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    return float(np.corrcoef(ra, rb)[0, 1])


POPS = {
    # name -> (population.npz dir, workload tag, seeds)
    "bf16_pop8": ("bf16_pop8", "flagship_bf16", list(range(333, 341))),
    "spendulum_adaptive_pop8b_polish": (
        "spendulum_adaptive_pop8b_polish", "spendulum_adaptive",
        list(range(1, 9))),
    # post-prune population (seeds 2,4,6,7) after the final annealed cycle
    "spendulum_adaptive_final": (
        "spendulum_adaptive_final", "spendulum_adaptive", [2, 4, 6, 7]),
    # the time-to-gate flagship population at its gate epoch (300): early
    # in training, mid-annealing -- the hardest selection state measured
    "ttg_pop8_masked5_px": (
        "ttg_pop8_masked5_px", "flagship", list(range(1, 9))),
}


def build_fn(workload: str, input_dim: int):
    if workload in ("flagship", "flagship_bf16"):
        from latentdiffeq import make_options
        from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                         default_layers)
        from pendulum import Pendulum
        dtype = jnp.bfloat16 if workload.endswith("bf16") else jnp.float32
        diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))

        def init_fn(k):
            e, d = default_layers(k, GOKUBasic(), input_dim, diffeq,
                                  dtype=dtype)
            return LatentDiffEqModel.build(GOKUBasic(), e, d)
        return init_fn
    return lambda k: build_model_keyed(workload, input_dim, k)


def probe_population(name: str, data) -> dict:
    from latentdiffeq.train import MultiSeedTrainer, TrainConfig
    latent, ps, x, val_set, val_latent, val_ps = data
    th_obs = pixel_angles(val_set)
    subdir, workload, seeds = POPS[name]
    path = os.path.join(ROOT, "benchmarks", "output_quality", subdir,
                        "population.npz")
    cfg = TrainConfig(seq_len=100, save_best=False)
    ms = MultiSeedTrainer(build_fn(workload, x.shape[-1]), cfg, seeds)
    ms.restore(path)
    dt = cfg.dt
    sde = workload == "spendulum_adaptive"

    t_full = jnp.arange(val_set.shape[1], dtype=jnp.float32) * dt
    elbos = ms.elbo_rank(val_set, t_full)
    best_vals = ms.per_seed_best_vals

    rows = []
    for i in range(ms.n_seeds):
        m = ms.seed_model(i)
        me = drift_twin(m) if sde else m
        gt = evaluate(me, val_set, val_latent, val_ps, dt)
        fc = evaluate(me, val_set, val_latent, val_ps, dt, context_len=50)
        rows.append({
            "seed": ms.seeds[i],
            "true_corr": round(gt["angle_corr_median"], 4),
            "true_L_err": round(gt["length_abs_err_median"], 4),
            "best_val": round(best_vals[i], 3),
            "elbo_b1": round(elbos[i], 3),
            "fc_recon": round(fc["val_recon_mse_per_pixel"], 6),
            "theta_icc": round(theta_window_icc(me, val_set, dt), 4),
            "z_consist": round(z_window_consistency(me, val_set, dt), 4),
            "pixel_corr": round(pixel_angle_corr(me, val_set, th_obs, dt),
                                4),
        })
        print(json.dumps(rows[-1]), flush=True)

    truth = np.array([r["true_corr"] for r in rows])
    top = int(np.argmax(truth))
    summary = {}
    for sel, sgn in (("best_val", -1), ("elbo_b1", -1), ("fc_recon", -1),
                     ("theta_icc", +1), ("z_consist", +1),
                     ("pixel_corr", +1)):
        vals = np.array([r[sel] for r in rows], dtype=np.float64)
        vals = np.where(np.isfinite(vals), vals, -sgn * np.inf)
        pick = int(np.argmax(sgn * vals))
        summary[sel] = {
            "spearman_vs_truth": round(spearman(sgn * vals, truth), 3),
            "picked_seed": rows[pick]["seed"],
            "picked_corr": rows[pick]["true_corr"],
            "top1_hit": bool(pick == top),
        }
    return {"population": name, "workload": workload,
            "true_best_seed": rows[top]["seed"],
            "true_best_corr": rows[top]["true_corr"],
            "per_seed": rows, "selectors": summary}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", action="append", choices=list(POPS),
                    default=None)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "benchmarks", "selector_probe.json"))
    args = ap.parse_args()
    pops = args.pop or list(POPS)

    from latentdiffeq.train import splitobs
    from create_data import load_or_generate
    latent, u0s, ps, frames = load_or_generate()
    x = frames.reshape(frames.shape[0], frames.shape[1], -1)
    _, val_set = splitobs(x, 0.9)
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)
    data = (latent, ps, x, val_set, val_latent, val_ps)

    results = []
    for name in pops:
        print(f"=== {name} ===", flush=True)
        results.append(probe_population(name, data))
        print(json.dumps(results[-1]["selectors"], indent=1), flush=True)

    # merge by population name: probing a subset (--pop) must not drop
    # committed rows whose population checkpoints have since been cleaned
    merged = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)["results"]
    probed = {r["population"] for r in results}
    merged = [r for r in merged if r["population"] not in probed] + results
    with open(args.out, "w") as f:
        json.dump({"results": merged}, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
