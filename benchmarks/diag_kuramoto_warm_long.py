"""Warm-start depth sweep for Kuramoto identification-at-init.

The round-4 campaign located the two failure stages separately:
the ASSIGNMENT is solved by lift-inversion + warm start (early-window
chart corr 0.956) and held by the z0-frame anchor, while ELBO training
erodes the PARAMETERS (omega corr 0.87 warm -> 0.30-0.69 across every
recipe variant: plain, whole-window anchor, z0 anchor, calmed
posterior, progressive horizon). The identified model is therefore the
warm-started one, BEFORE ELBO fine-tuning — this sweep measures how far
the encoder regression alone can push parameter recovery (the
estimator's own ceiling is omega corr 1.000 / K corr 0.996,
diag_kuramoto_warm.json stage1).

For each warm-start depth: full evaluate() on the held-out val set
(encoder generalization — the regression only ever sees train), plus
the early-window (frames 0-10) assignment-matched chart corr.

Usage: python benchmarks/diag_kuramoto_warm_long.py [--steps 1500 6000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from quality_kuramoto import (DT, _match_corr, build_model_keyed,  # noqa: E402
                              evaluate, warm_start)
from train_kuramoto import (estimate_omega_k, invert_lift_phases,  # noqa: E402
                            make_data)

from latentdiffeq.train import latent_warm_start, splitobs  # noqa: E402

N_OSC, SPREAD, KMAX = 10, 0.5, 2.0


def warm_start_z0_only(model, train_x, estimates, steps):
    """Warm regression with ONLY the z0 term — isolates whether the z0
    plateau (sin+cos MSE ~0.34 under the full multi-head loss) is
    multi-task gradient interference or an encoder-path capacity limit."""
    phi, _, _ = estimates
    xb = jnp.asarray(train_x)
    sin0 = jnp.asarray(np.sin(phi[:, 0]))
    cos0 = jnp.asarray(np.cos(phi[:, 0]))

    def loss_fn(l_hat):
        z0_hat, _ = l_hat
        return (jnp.mean((jnp.sin(z0_hat) - sin0) ** 2)
                + jnp.mean((jnp.cos(z0_hat) - cos0) ** 2))

    model, losses = latent_warm_start(model, xb, loss_fn, steps=steps,
                                      lr=1e-3)
    return model, losses


def build_wide(input_dim, key, kur, lift):
    """2x encoder-path widths (rnn 64->32, latent z0 32): the capacity
    variant for the z0-chart question."""
    from latentdiffeq import nn
    from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,
                                     default_layers)
    enc, dec = default_layers(key, GOKUBasic(), input_dim, kur,
                              hidden_dim_resnet=100,
                              latent_to_diffeq_dim=100,
                              rnn_input_dim=64, rnn_output_dim=32,
                              latent_dim_z0=32)
    inv = 1.0 / (lift["mx"] - lift["mn"])
    recon = nn.FrozenLinear.from_arrays(
        lift["W"], lift["b"], nn.relu,
        out_scale=inv, out_shift=-lift["mn"] * inv)
    return LatentDiffEqModel.build(GOKUBasic(), enc, (dec[0], dec[1],
                                                      recon))


def early_chart_stats(model, val_set, val_zsin, k: int = 10) -> dict:
    """Assignment-matched chart corr AND assignment statistics on the
    first k frames — where the chart claim is separable from parameter
    drift (phase error ~ t * omega_err decorrelates late frames even
    under a perfectly aligned chart)."""
    t = jnp.arange(100, dtype=jnp.float32) * DT

    @jax.jit
    def fwd(m, xv):
        mu, _ = m.encoder(xv)
        (_, z_hat, _), _ = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return z_hat

    zv = np.asarray(fwd(model, jnp.asarray(val_set)))
    true = np.asarray(val_zsin)[:, :100]
    per = [_match_corr(zv[i, :k], true[i, :k]) for i in range(zv.shape[0])]
    corrs = [c for c, _ in per]
    n_osc = true.shape[-1]

    # identity-assignment corr: per-oscillator Pearson WITHOUT matching.
    # On short windows the optimal-matching cost matrix is degenerate
    # (10 near-linear sinusoid segments — many permutations tie within
    # noise, so "dominant assignment" reads as chance even for a
    # perfectly aligned chart); the chart claim is identity corr ~=
    # matched corr.
    def identity_corr(pred, tr):
        p = pred - pred.mean(0)
        q = tr - tr.mean(0)
        den = np.sqrt((p * p).sum(0) * (q * q).sum(0))
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.where(den > 0, (p * q).sum(0) / den, 0.0)
        return float(np.mean(c))

    id_early = [identity_corr(zv[i, :k], true[i, :k])
                for i in range(zv.shape[0])]
    id_full = [identity_corr(zv[i], true[i]) for i in range(zv.shape[0])]

    # frame-0 identity corr ACROSS the batch, per oscillator: the pure
    # z0-chart generalization measure — unconfounded by the theta head
    # (trajectory-corr metrics mix z0 alignment with omega drift).
    f0 = identity_corr(zv[:, 0], true[:, 0])   # (n, N) pair over batch
    identity = tuple(range(n_osc))
    counts = {}
    for _, a in per:
        counts[a] = counts.get(a, 0) + 1
    # fraction of oscillators each trajectory maps to themselves: a
    # smoother chart-alignment measure than exact-permutation identity
    # (near-degenerate neighbors tie on 10 frames)
    fixed = [sum(1 for i, j in enumerate(a) if i == j) / n_osc
             for _, a in per]
    return {
        "early_chart_corr_frames0_10": round(float(np.median(corrs)), 4),
        "early_n_distinct_assignments": len(counts),
        "early_dominant_assignment_frac": round(
            float(max(counts.values()) / len(per)), 4),
        "early_dominant_is_identity": (
            max(counts.items(), key=lambda kv: kv[1])[0] == identity),
        "early_identity_frac": float(counts.get(identity, 0) / len(per)),
        "early_fixed_point_frac_mean": round(float(np.mean(fixed)), 4),
        "early_identity_corr_median": round(float(np.median(id_early)), 4),
        "full_identity_corr_median": round(float(np.median(id_full)), 4),
        "frame0_identity_corr_mean": round(f0, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, nargs="+",
                    default=[1500, 4000, 8000])
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--z0-only", action="store_true",
                    help="warm loss = z0 term only (interference vs "
                    "capacity attribution for the z0 plateau)")
    ap.add_argument("--wide", action="store_true",
                    help="2x encoder-path widths (rnn 64/32, latent 32)")
    args = ap.parse_args()

    print("generating data + inverting lift...", flush=True)
    x, z_sin, thetas, kur, lift = make_data(
        n_osc=N_OSC, k_range=(0.2, KMAX), omega_spread=SPREAD,
        return_lift=True)
    train_set, val_set = splitobs(x, 0.9)
    _, val_thetas = splitobs(thetas, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)

    phi, _ = invert_lift_phases(train_set, lift, DT)
    deltas = np.linspace(-SPREAD, SPREAD, N_OSC)
    om_ls, k_ls = estimate_omega_k(phi, deltas)

    if args.wide:
        model0 = build_wide(x.shape[-1], jax.random.PRNGKey(args.seed),
                            kur, lift)
    else:
        model0 = build_model_keyed(x.shape[-1],
                                   jax.random.PRNGKey(args.seed), kur,
                                   lift)
    variant = ("wide_" if args.wide else "") + (
        "z0only" if args.z0_only else "full")
    report = {"tag": f"diag_kuramoto_warm_long_{variant}",
              "seed": args.seed, "variant": variant, "stages": {}}
    for steps in args.steps:
        t0 = time.perf_counter()
        if args.z0_only:
            warm, losses = warm_start_z0_only(model0, train_set,
                                              (phi, om_ls, k_ls), steps)
            z0_loss_final = round(float(np.asarray(losses)[-1]), 5)
        else:
            warm = warm_start(model0, train_set, (phi, om_ls, k_ls),
                              steps=steps)
            z0_loss_final = None
        ev = evaluate(warm, val_set, val_zsin, val_thetas)
        ev.update(early_chart_stats(warm, val_set, val_zsin))
        ev["warm_s"] = round(time.perf_counter() - t0, 2)
        if z0_loss_final is not None:
            ev["z0_warm_loss_final"] = z0_loss_final
            print(steps, "z0_warm_loss_final:", z0_loss_final, flush=True)
        report["stages"][str(steps)] = ev
        print(steps, json.dumps({k: ev[k] for k in (
            "omega_corr", "k_corr", "state_corr_median",
            "early_chart_corr_frames0_10",
            "early_identity_corr_median", "full_identity_corr_median",
            "early_dominant_assignment_frac",
            "early_fixed_point_frac_mean",
            "omega_abs_err_median", "warm_s")}), flush=True)

    name = ("diag_kuramoto_warm_long.json" if variant == "full"
            else f"diag_kuramoto_warm_long_{variant}.json")
    with open(os.path.join(ROOT, "benchmarks", name), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
