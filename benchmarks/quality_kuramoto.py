"""Quality/identifiability record for the transform-hook mechanistic
template (BASELINE.json config 4): GOKU on Kuramoto with learned
theta = [omega, K], phases observed through ``transform=sin``.

The VdP record (quality_vdp.py) proves the plain custom-dynamics path;
this harness proves the ``transform_after_diffeq`` path end to end —
the hook the reference singles out as "mainly used for Kuramoto-like
systems" (reference: LatentODE.jl:76, GOKU.jl:124,136). Observations
are a fixed random linear+relu lift of sin(phases) to 64 channels
(train_kuramoto.py::make_data), so (omega, K) are only inferable
through the dynamics: omega from the common rotation rate, K from the
synchronization transient.

Metrics (full val set, deterministic encode):
- omega_corr / omega_abs_err_median, k_corr / k_abs_err_median:
  recovery of the two mechanistic parameters over the val set.
- state_corr_median: per-trajectory chart check in sin space, with the
  oscillator PERMUTATION gauge fixed per trajectory by optimal
  assignment (Kuramoto dynamics are permutation-equivariant, so the
  model is free to learn any oscillator ordering; the observation map
  is fixed, so one global ordering should dominate — the record also
  reports how many distinct assignments the val set used).
- val_recon_mse: recon MSE in the normalized observation space.

Usage:
    python benchmarks/quality_kuramoto.py --seeds 4 --epochs 2000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "custom_dynamics"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from train_kuramoto import (estimate_omega_k, invert_lift_phases,  # noqa: E402
                            make_data)

from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import (MultiSeedTrainer, TrainConfig,  # noqa: E402
                                Trainer, splitobs)

DT = 0.1


def build_model_keyed(input_dim: int, key, kur, lift=None,
                      constructive: bool = False):
    """Default GOKU stack; with ``lift`` the reconstructor slot is the
    KNOWN observation map (nn.FrozenLinear — static, never trained):
    x_hat = (relu(z_sin @ W + b) - mn) / (mx - mn), exactly the map that
    generated the data. This is the constructive test of the round-4
    mechanism finding: if the chart fails to form only because a learned
    reconstructor absorbs an arbitrary latent basis, pinning the
    observation model must force the per-oscillator chart.

    ``constructive=True`` (requires lift; round-5 control, VERDICT r4
    item 2a) additionally replaces the feature-extractor slot with the
    CONSTRUCTED frame-wise readout: a FrozenLinear whose first 2*n_osc
    output channels are [relu(readout_i), relu(-readout_i)] with
    readout = the unsupervised ridge inversion of the known lift
    (fit_lift_readout, R^2 ~0.99) — oscillator i lives at fixed,
    identity-aligned channels (i, n_osc+i), so the permutation
    assignment the round-4 campaign located as the failure is REMOVED
    at the encoder input (and, being static, cannot be eroded by ADAMW
    decay). The relu pair encodes the signed sin exactly through the
    slot's relu activation."""
    from latentdiffeq import nn
    enc, dec = default_layers(key, GOKUBasic(), input_dim, kur,
                              hidden_dim_resnet=100,
                              latent_to_diffeq_dim=100)
    if lift is not None:
        inv = 1.0 / (lift["mx"] - lift["mn"])
        recon = nn.FrozenLinear.from_arrays(
            lift["W"], lift["b"], nn.relu,
            out_scale=inv, out_shift=-lift["mn"] * inv)
        dec = (dec[0], dec[1], recon)
    if constructive:
        if lift is None:
            raise ValueError("constructive encoder requires the known lift")
        from train_kuramoto import fit_lift_readout
        R, c = fit_lift_readout(lift)        # (n_osc, input_dim), (n_osc,)
        n_osc = R.shape[0]
        rnn_input_dim = 32                   # default_layers default
        if 2 * n_osc > rnn_input_dim:
            raise ValueError("constructive FE needs rnn_input_dim >= "
                             f"2*n_osc ({2 * n_osc})")
        W = np.zeros((input_dim, rnn_input_dim), np.float32)
        b = np.zeros(rnn_input_dim, np.float32)
        W[:, :n_osc] = R.T
        b[:n_osc] = c
        W[:, n_osc:2 * n_osc] = -R.T
        b[n_osc:2 * n_osc] = -c
        fe = nn.FrozenLinear.from_arrays(W, b, nn.relu)
        enc = (fe, enc[1], enc[2])
    return LatentDiffEqModel.build(GOKUBasic(), enc, dec)


def warm_start(model, train_x, estimates, steps: int = 500):
    """Assignment-aware warm start (RESULTS.md round-4 addendum: the
    known-lift runs located the chart failure in optimization — gradient
    descent cannot discover the oscillator permutation from a random
    init). Inversion of the KNOWN observation map gives unsupervised
    per-frame phases (train_kuramoto.invert_lift_phases, measured R^2
    1.0) and the dynamics residual gives (omega, K) by least squares
    (estimate_omega_k, corr 1.000/0.996); a short full-batch regression
    (train.latent_warm_start) pulls the encoder's z0/theta paths into
    the aligned basin before ELBO training."""
    from latentdiffeq.train import latent_warm_start
    phi, om, kk = estimates
    xb = jnp.asarray(train_x)
    sin0 = jnp.asarray(np.sin(phi[:, 0]))
    cos0 = jnp.asarray(np.cos(phi[:, 0]))
    omj = jnp.asarray(om)
    kkj = jnp.asarray(kk)

    def loss_fn(l_hat, mu, logvar):
        z0_hat, th_hat = l_hat
        l_z0 = (jnp.mean((jnp.sin(z0_hat) - sin0) ** 2)
                + jnp.mean((jnp.cos(z0_hat) - cos0) ** 2))
        l_om = jnp.mean((th_hat[:, 0] - omj) ** 2)
        l_k = jnp.mean((th_hat[:, 1] - kkj) ** 2)
        # calm the posterior: fresh logvar heads emit O(1) values, so the
        # first variational epochs would sample sigma ~ 1-3 latent noise
        # and kick training straight out of the aligned basin (measured:
        # the anc1 collapse). Pull logvar toward -6 (sigma ~ 0.05).
        l_lv = sum(jnp.mean((lv + 6.0) ** 2) for lv in logvar)
        return l_z0 + l_om + l_k + 0.1 * l_lv

    # no host-side convergence print: this runs under MultiSeedTrainer's
    # vmapped model factory, where losses are traced
    model, _ = latent_warm_start(model, xb, loss_fn, steps=steps, lr=1e-3,
                                 with_moments=True)
    return model


def supervised_probe(x, thetas, seed: int = 0) -> dict:
    """Supervised ceiling: can (omega, K) be read from the observations at
    all? Ridge regression per target over two feature sets, fitted on the
    train split and scored R^2 on the val split (the VdP campaign's probe
    protocol — if the ceiling is high and the model fails, the recipe or
    objective is at fault, not the data):

    - ``flat``: the raw flattened window (T*input_dim features).
    - ``spec``: per-channel FFT magnitude spectrum (frequency content —
      omega lives here; K shapes the transient envelope).
    """
    n = x.shape[0]
    tr = int(0.9 * n)

    def ridge_r2(F, y, lam):
        # center y and fit without an intercept so lambda never shrinks
        # the mean prediction (the intercept must stay unpenalized)
        A, Ate = F[:tr], F[tr:]
        ytr, yte = y[:tr], y[tr:]
        mu = ytr.mean()
        w = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]),
                            A.T @ (ytr - mu))
        pred = Ate @ w + mu
        return 1.0 - (np.sum((yte - pred) ** 2)
                      / np.sum((yte - yte.mean()) ** 2))

    feats = {
        "flat": np.asarray(x, np.float64).reshape(n, -1),
        "spec": np.abs(np.fft.rfft(np.asarray(x, np.float64),
                                   axis=1)).reshape(n, -1),
    }
    out = {}
    for ti, name in ((0, "omega"), (1, "k")):
        y = np.asarray(thetas[:, ti], np.float64)
        best = -np.inf
        for fname, F in feats.items():
            Fz = (F - F.mean(0)) / (F.std(0) + 1e-9)
            for lam in (1e0, 1e1, 1e2, 1e3):
                r2 = ridge_r2(Fz, y, lam)
                best = max(best, r2)
                out[f"{name}_r2_{fname}_lam{lam:g}"] = round(float(r2), 4)
        out[f"{name}_r2_best"] = round(float(best), 4)
    return out


def _match_corr(pred: np.ndarray, true: np.ndarray) -> tuple[float, tuple]:
    """Mean per-oscillator Pearson corr after the optimal (sign-aware)
    oscillator assignment for ONE trajectory. pred/true: (T, N)."""
    from scipy.optimize import linear_sum_assignment
    p = pred - pred.mean(0)
    q = true - true.mean(0)
    denom = np.sqrt((p * p).sum(0))[:, None] * np.sqrt((q * q).sum(0))[None]
    with np.errstate(invalid="ignore", divide="ignore"):
        C = np.where(denom > 0, (p.T @ q) / denom, 0.0)   # (N, N)
    rows, cols = linear_sum_assignment(-np.abs(C))
    return float(np.abs(C)[rows, cols].mean()), tuple(cols[np.argsort(rows)])


def evaluate(model, val_set, val_zsin, val_thetas) -> dict:
    x = jnp.asarray(val_set)
    T = x.shape[1]
    t = jnp.arange(T, dtype=jnp.float32) * DT

    @jax.jit
    def fwd(m, xv):
        mu, logvar = m.encoder(xv)
        out, aux = m.decoder(mu, t, key=jax.random.PRNGKey(0))
        return out, aux

    (x_hat, z_hat, l_hat), aux = fwd(model, x)
    z = np.asarray(z_hat)                          # (n, T, N) — sin space
    true = np.asarray(val_zsin)[:, :T]
    th_true = np.asarray(val_thetas)               # (n, 2) [omega, K]
    th_hat = np.asarray(l_hat[1]).reshape(th_true.shape[0], -1)

    per_traj = [_match_corr(z[i], true[i]) for i in range(z.shape[0])]
    corrs = np.array([c for c, _ in per_traj])
    assignments = {}
    for _, a in per_traj:
        assignments[a] = assignments.get(a, 0) + 1

    # identity-assignment chart check (round 5, VERDICT r4 item 2a): mean
    # per-oscillator |corr| WITHOUT permutation matching — slot i must
    # track oscillator i. This is the bar the constructive encoder is
    # built to move; the permutation-matched state_corr above is the
    # looser "any consistent chart" bar.
    def _identity_corr(p, q):
        p = p - p.mean(0)
        q = q - q.mean(0)
        den = np.sqrt((p * p).sum(0) * (q * q).sum(0))
        with np.errstate(invalid="ignore", divide="ignore"):
            cc = np.where(den > 0, (p * q).sum(0) / den, 0.0)
        return float(np.abs(cc).mean())

    id_corrs = np.array([_identity_corr(z[i], true[i])
                         for i in range(z.shape[0])])

    om_err = np.abs(th_hat[:, 0] - th_true[:, 0])
    k_err = np.abs(th_hat[:, 1] - th_true[:, 1])
    # omega sign gauge: psi = -phi satisfies Kuramoto with omega' = -omega
    # and the SAME K (sin(psi_j - psi_i) = -sin(phi_j - phi_i) flips the
    # coupling term's sign along with d(psi)/dt), while sin(phi) =
    # -sin(psi) is absorbed by the reconstructor's first linear layer — so
    # omega is identifiable only UP TO A GLOBAL SIGN, exactly like the
    # pendulum's angle chart (quality_goku angle_sign). Resolve the gauge
    # by the correlation sign and report gauge-fixed recovery too.
    om_corr_raw = float(np.corrcoef(th_hat[:, 0], th_true[:, 0])[0, 1])
    sign = float(np.sign(om_corr_raw)) or 1.0
    om_err_gauge = np.abs(sign * th_hat[:, 0] - th_true[:, 0])
    return {
        "omega_sign": sign,
        "omega_corr_gauge": abs(om_corr_raw),
        "omega_abs_err_median_gauge": float(np.median(om_err_gauge)),
        "val_recon_mse": float(np.mean((np.asarray(x) -
                                        np.asarray(x_hat)) ** 2)),
        "state_corr_median": float(np.median(corrs)),
        "state_corr_min": float(np.min(corrs)),
        "state_corr_identity_median": float(np.median(id_corrs)),
        "state_corr_identity_min": float(np.min(id_corrs)),
        "n_distinct_assignments": len(assignments),
        "dominant_assignment_frac": float(max(assignments.values())
                                          / len(per_traj)),
        "omega_abs_err_median": float(np.median(om_err)),
        "omega_corr": float(np.corrcoef(th_hat[:, 0], th_true[:, 0])[0, 1]),
        "k_abs_err_median": float(np.median(k_err)),
        "k_corr": float(np.corrcoef(th_hat[:, 1], th_true[:, 1])[0, 1]),
        "omega_range_true": [float(th_true[:, 0].min()),
                             float(th_true[:, 0].max())],
        "k_range_true": [float(th_true[:, 1].min()),
                         float(th_true[:, 1].max())],
        "n_val_failed": int(np.sum(~np.asarray(aux["success"]))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="kuramoto_pop4")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--progressive", action="store_true",
                    help="seq-len curriculum")
    ap.add_argument("--prog-duration", type=int, default=300)
    ap.add_argument("--start-seq-len", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=1e-3)
    ap.add_argument("--free-bits", type=float, default=0.0)
    ap.add_argument("--end-beta", type=float, default=0.01,
                    help="KL ceiling; the VdP campaign measured tiny "
                         "beta as a precondition for mechanistic-"
                         "parameter identification (RESULTS.md)")
    ap.add_argument("--n-cycle", type=int, default=1)
    ap.add_argument("--n-osc", type=int, default=10)
    ap.add_argument("--k-max", type=float, default=2.0)
    ap.add_argument("--omega-spread", type=float, default=0.0,
                    help="fixed per-oscillator frequency offsets "
                    "linspace(-s, s, N) baked into the dynamics spec "
                    "(custom.Kuramoto): 0 = the original identical-"
                    "frequency workload; > 0 = the classic Kuramoto "
                    "setting (distinct oscillators, locking transition "
                    "at K_c ~ 4s/pi)")
    ap.add_argument("--known-lift", action="store_true",
                    help="reconstructor = the TRUE frozen observation map "
                    "(nn.FrozenLinear) instead of a learned resnet — the "
                    "known-observation-model decoder variant; the "
                    "constructive test of the chart-formation mechanism "
                    "(RESULTS.md round-4 Kuramoto known-lift section)")
    ap.add_argument("--warm-start", type=int, default=0, metavar="STEPS",
                    help="requires --known-lift: pretrain the encoder's "
                    "z0/omega paths for STEPS full-batch Adam steps onto "
                    "the lift-inversion estimates before ELBO training "
                    "(the assignment-aware init the known-lift negative "
                    "calls for). With the posterior-calming term in the "
                    "warm loss, identification saturates around 16000 "
                    "steps (omega corr 0.949, K corr 0.984 — "
                    "diag_kuramoto_warm_long.json); 1500 only reaches "
                    "omega corr ~0.3")
    ap.add_argument("--anchor-weight", type=float, default=0.0,
                    help="requires --known-lift: latent chart anchor "
                    "(losses.loss_batch anchor=): every training window "
                    "pays anchor_weight * vector_mse(readout(x), z_hat) "
                    "where readout is the unsupervised ridge inversion "
                    "of the known lift (fit_lift_readout) — the measured "
                    "fix for ELBO training destroying the warm-started "
                    "aligned chart (kl_ws2 record: omega corr 0.87 warm "
                    "-> 0.18 after 2000 plain-ELBO epochs)")
    ap.add_argument("--anchor-frames", type=int, default=None,
                    help="anchor only the first K frames of each window "
                    "(losses.loss_batch anchor_frames=): the whole-"
                    "window anchor is dominated by phase drift "
                    "compounding through the solve and destabilizes K "
                    "(the anc1 collapse record); K=1 pins the z0 chart "
                    "with no solver gradient at all")
    ap.add_argument("--constructive-encoder", action="store_true",
                    help="requires --known-lift: replace the feature-"
                    "extractor slot with the CONSTRUCTED frame-wise ridge "
                    "readout of the known lift (FrozenLinear relu pairs, "
                    "identity-aligned oscillator slots) — the round-5 "
                    "control for the chart-formation failure: the "
                    "permutation assignment is removed at the encoder "
                    "input instead of asked from gradient descent "
                    "(VERDICT r4 item 2a)")
    ap.add_argument("--deterministic", action="store_true",
                    help="variational=False MAP training (the reference's "
                    "own model(x, t, variational=false) mode, "
                    "LatentDiffEqModel.jl:31) with beta forced to 0 — the "
                    "round-5 control for whether the warm-basin erosion "
                    "(ws8k: omega corr 0.945 -> 0.426) is variational-"
                    "specific (VERDICT r4 item 2b)")
    ap.add_argument("--dispatch", type=int, default=25)
    ap.add_argument("--probe", action="store_true",
                    help="run the supervised (omega, K) readout ceiling "
                    "on the dataset and exit (no training)")
    ap.add_argument("--eval-ckpt", default=None)
    ap.add_argument("--eval-population", default=None,
                    help="path to a save_population() checkpoint: "
                    "restore and evaluate EVERY replica (live and "
                    "best-carry), no training — the per-seed report card "
                    "for a finished campaign run")
    args = ap.parse_args()

    x, z_sin, thetas, kur, lift = make_data(n_osc=args.n_osc,
                                            k_range=(0.2, args.k_max),
                                            omega_spread=args.omega_spread,
                                            return_lift=True)
    lift = lift if args.known_lift else None
    if args.constructive_encoder and not args.known_lift:
        ap.error("--constructive-encoder requires --known-lift (the "
                 "readout is derived from the observation map)")
    if args.deterministic:
        args.end_beta = 0.0

    if args.probe:
        rec = {"tag": f"{args.tag}_probe",
               "workload": "kuramoto_supervised_probe",
               "n_osc": args.n_osc, "k_max": args.k_max,
               "omega_spread": args.omega_spread,
               "probe": supervised_probe(x, thetas)}
        out = os.path.join(ROOT, "benchmarks",
                           f"quality_{args.tag}_probe.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
        print(json.dumps(rec, indent=2))
        return
    train_set, val_set = splitobs(x, 0.9)
    _, val_zsin = splitobs(z_sin, 0.9)
    _, val_thetas = splitobs(thetas, 0.9)

    outdir = os.path.join(ROOT, "benchmarks", "output_quality", args.tag)
    cfg = TrainConfig(
        lr=args.lr, decay=args.decay, batch_size=args.batch_size,
        seq_len=args.seq_len, epochs=args.epochs, seed=args.seed, dt=DT,
        start_beta=0.0, end_beta=args.end_beta, n_cycle=args.n_cycle,
        ratio=0.9, variational=not args.deterministic,
        progressive_training=args.progressive,
        prog_training_duration=args.prog_duration,
        start_seq_len=args.start_seq_len,
        free_bits=args.free_bits, epochs_per_dispatch=args.dispatch,
        checkpoint_dir=outdir)

    if args.eval_ckpt:
        from latentdiffeq.train.checkpoint import load_checkpoint
        tr = Trainer(build_model_keyed(x.shape[-1],
                                       jax.random.PRNGKey(args.seed), kur,
                                       lift, args.constructive_encoder),
                     cfg)
        tree, meta = load_checkpoint(
            args.eval_ckpt, {"model": tr.model, "opt_state": tr.opt_state,
                             "key": tr.key})
        rec = {"tag": args.tag, "ckpt": args.eval_ckpt,
               "meta_epoch": meta.get("epoch"),
               "best": evaluate(tree["model"], val_set, val_zsin,
                                val_thetas)}
        print(json.dumps(rec, indent=2))
        return

    if args.eval_population:
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(
            lambda k: build_model_keyed(x.shape[-1], k, kur, lift,
                                        args.constructive_encoder), cfg,
            seeds)
        ms.restore(args.eval_population)
        rows = []
        for i in range(ms.n_seeds):
            for side, m in (("live", ms.seed_model(i)),
                            ("best", ms.best_seed_model(i))):
                e = evaluate(m, val_set, val_zsin, val_thetas)
                rows.append({"seed": ms.seeds[i], "side": side,
                             **{k: (round(v, 4) if isinstance(v, float)
                                    else v) for k, v in e.items()
                                if "range" not in k}})
                print(json.dumps(rows[-1]), flush=True)
        rec = {"tag": args.tag, "population": args.eval_population,
               "epoch": ms.epoch, "per_seed_best_val":
               [v if np.isfinite(v) else None
                for v in ms.per_seed_best_vals], "rows": rows}
        out = os.path.join(ROOT, "benchmarks",
                           f"quality_{args.tag}_per_seed.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
        return

    estimates = None
    if args.warm_start:
        if not args.known_lift:
            ap.error("--warm-start requires --known-lift (the inversion "
                     "needs the observation map)")
        print("inverting the known lift for warm-start targets...",
              flush=True)
        phi, _ = invert_lift_phases(train_set, lift, DT)
        deltas = np.linspace(-args.omega_spread, args.omega_spread,
                             args.n_osc)
        om_ls, k_ls = estimate_omega_k(phi, deltas, DT)
        estimates = (phi, om_ls, k_ls)

    def make_model(k):
        m = build_model_keyed(x.shape[-1], k, kur, lift,
                              args.constructive_encoder)
        if estimates is not None:
            m = warm_start(m, train_set, estimates, steps=args.warm_start)
        return m

    loss_fn = None
    if args.anchor_weight:
        if not args.known_lift:
            ap.error("--anchor-weight requires --known-lift (the readout "
                     "needs the observation map)")
        from functools import partial

        from train_kuramoto import fit_lift_readout

        from latentdiffeq.train import loss_batch
        R, c = fit_lift_readout(lift)
        Rj, cj = jnp.asarray(R), jnp.asarray(c)
        loss_fn = partial(loss_batch, anchor=lambda xb: xb @ Rj.T + cj,
                          anchor_weight=args.anchor_weight,
                          anchor_frames=args.anchor_frames)

    lkw = {} if loss_fn is None else {"loss_fn": loss_fn}
    t0 = time.perf_counter()
    if args.seeds:
        seeds = list(range(args.seed, args.seed + args.seeds))
        ms = MultiSeedTrainer(make_model, cfg, seeds, **lkw)
        ms.fit(train_set, val_set, verbose=True)
        best, winner = ms.best_model, ms.best_seed
        per_seed = [v if np.isfinite(v) else None
                    for v in ms.per_seed_best_vals]
    else:
        tr = Trainer(make_model(jax.random.PRNGKey(args.seed)), cfg, **lkw)
        tr.fit(train_set, val_set, verbose=True, log_every=100)
        best = tr.best_model if tr._best_dev is not None else tr.model
        winner, per_seed = args.seed, None
    total = time.perf_counter() - t0

    record = {
        "tag": args.tag, "workload": "kuramoto", "config": vars(args),
        "total_s": total, "winner_seed": winner,
        "per_seed_best_val": per_seed,
        "best": evaluate(best, val_set, val_zsin, val_thetas),
    }
    out = os.path.join(ROOT, "benchmarks", f"quality_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
