"""GOKU on Kuramoto phase oscillators with learned (omega, K)
(BASELINE.json config 4: "user-defined mechanistic latent dynamics
template"; the ``transform_after_diffeq`` showcase — reference:
GOKU.jl:124,136, LatentODE.jl:76 "mainly used for Kuramoto-like
systems").

The latent state is the N-vector of phases; the decoder observes it
through ``transform=sin`` (custom.py::Kuramoto), so the reconstructor —
and therefore the data below — sees only sin(phases): a fixed random
linear+relu lift of sin(z) to ``input_dim`` channels, mirroring the VdP
setup (train_vdp.py).

Identifiability structure of the task (measured in
benchmarks/quality_kuramoto.py): omega is the common rotation rate of
every observed channel — easy. K is only visible in the synchronization
TRANSIENT (identical natural frequencies synchronize for any K > 0, at
rate ~K), so the initial phases are spread over the full circle and the
window must cover the early part of each trajectory.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from custom import Kuramoto  # noqa: E402

from latentdiffeq import ODEProblem, make_options, solve_ensemble  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402


def make_data(n_traj=256, T=100, dt=0.1, n_osc=10, input_dim=64, seed=0,
              omega_range=(1.0, 3.0), k_range=(0.2, 2.0),
              omega_spread: float = 0.0, return_lift: bool = False):
    """Kuramoto ensemble: per-trajectory omega ~ U(omega_range) (the MEAN
    natural frequency), K ~ U(k_range); u0 phases ~ U(-pi, pi).

    ``k_range=(0.2, 2.0)`` spans sync time constants ~0.5-5x the 10 s
    window, so the transient — the only part of the signal that carries
    K — is resolved at both ends of the range.

    ``omega_spread``: fixed per-oscillator frequency offsets
    linspace(-spread, +spread, N) baked into the dynamics spec (see
    custom.Kuramoto). 0 = the original identical-frequency workload
    (structurally non-identifiable latent chart — measured,
    RESULTS.md round-4 Kuramoto section); > 0 = the classic Kuramoto
    setting with a real locking transition at K_c ~ 4*spread/pi.

    Returns (x, z_sin, thetas, diffeq): x the (n, T, input_dim)
    observations, z_sin the (n, T, n_osc) true sin-phases (the latent
    chart the model can see — raw phases are unobservable through sin),
    thetas the (n, 2) true [omega, K]. With ``return_lift=True`` a fifth
    item: the exact observation map ``{W, b, mn, mx}`` such that
    x = (relu(z_sin @ W + b) - mn) / (mx - mn) — for the known-
    observation-model decoder variant (nn.FrozenLinear reconstructor).
    """
    rng = np.random.default_rng(seed)
    u0s = rng.uniform(-np.pi, np.pi, (n_traj, n_osc)).astype(np.float32)
    thetas = np.stack([
        rng.uniform(*omega_range, n_traj),
        rng.uniform(*k_range, n_traj),
    ], axis=1).astype(np.float32)
    saveat = jnp.arange(T, dtype=jnp.float32) * dt
    kur = Kuramoto(n_oscillators=n_osc,
                   options=make_options(adaptive=False, substeps=4),
                   omega_spread=omega_spread)
    prob = ODEProblem(f=kur.f, u0=jnp.asarray(u0s[0]),
                      tspan=(0.0, float(saveat[-1])),
                      p=jnp.asarray(thetas[0]))
    sol = solve_ensemble(prob, kur.solver, u0s=jnp.asarray(u0s),
                         ps=jnp.asarray(thetas), saveat=saveat)
    z_sin = np.sin(np.asarray(sol.ys))           # (n, T, n_osc)
    W = rng.normal(0, 1, (n_osc, input_dim)).astype(np.float32)
    b = rng.normal(0, 0.3, (input_dim,)).astype(np.float32)
    x = np.maximum(z_sin @ W + b, 0.0)           # fixed random observation map
    mn, mx = float(x.min()), float(x.max())
    x = (x - mn) / (mx - mn)
    if return_lift:
        return (x.astype(np.float32), z_sin, thetas, kur,
                {"W": W, "b": b, "mn": mn, "mx": mx})
    return x.astype(np.float32), z_sin, thetas, kur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--input-dim", type=int, default=64)
    args = ap.parse_args()

    x, z_sin, thetas, kur = make_data(input_dim=args.input_dim)
    train_set, val_set = splitobs(x, 0.9)

    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              args.input_dim, kur, hidden_dim_resnet=100,
                              latent_to_diffeq_dim=100)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(epochs=args.epochs, batch_size=64, seq_len=50,
                      dt=0.1, seed=7,
                      # the measured custom-dynamics identification
                      # recipe: tiny KL ceiling (quality_vdp.py campaign)
                      start_beta=0.0, end_beta=0.01, n_cycle=1,
                      checkpoint_dir=os.path.join(
                          os.path.dirname(os.path.abspath(__file__)),
                          "output_kuramoto"))
    Trainer(model, cfg).fit(train_set, val_set)




def invert_lift_phases(x, lift, dt=0.1):
    """UNSUPERVISED per-frame inversion of the known observation map,
    then temporal branch disambiguation to phases.

    Given the known lift x = (relu(z_sin @ W + b) - mn)/(mx - mn), each
    frame's sin-phases solve a least-squares system on the relu-active
    channel set (measured exact: R^2 1.0 per oscillator). The sin -> phase
    branch (phi vs pi - phi) is fixed by the sign of d(sin)/dt: phases
    advance at omega ~ U(1,3) > 0, so sign(cos phi) = sign(d sin/dt).
    This is the Kuramoto analog of the pendulum's pixel-angle renderer
    inversion (examples/pendulum/pixel_observable.py) — identification
    through the KNOWN observation model, no labels.

    Returns (phi, omega_hat): phi (n, T, N) unwrapped phases,
    omega_hat (n,) the per-trajectory median phase rate.
    """
    W, b = lift["W"], lift["b"]
    n_osc = W.shape[0]
    Y = np.asarray(x) * (lift["mx"] - lift["mn"]) + lift["mn"]
    n, T, _ = Y.shape
    Z = np.empty((n, T, n_osc), np.float64)
    for i in range(n):
        for t in range(T):
            y = Y[i, t]
            a = y > 1e-6
            if a.sum() < n_osc:
                a = np.ones_like(a, bool)
            Z[i, t] = np.linalg.lstsq(W[:, a].T, y[a] - b[a], rcond=None)[0]
    s = np.clip(Z, -1.0, 1.0)
    cos_sign = np.sign(np.gradient(s, axis=1))
    cos_sign[cos_sign == 0] = 1.0
    phi = np.unwrap(np.arctan2(s, cos_sign * np.sqrt(1.0 - s ** 2)), axis=1)
    omega_hat = np.median(np.diff(phi, axis=1), axis=(1, 2)) / dt
    return phi.astype(np.float32), omega_hat.astype(np.float32)


def fit_lift_readout(lift, n_samples=8192, seed=0, lam=1e-3):
    """UNSUPERVISED frame-wise readout of sin-phases from observations,
    derived from the KNOWN lift alone: draw random phases, push their
    sins through the known map x = (relu(u @ W + b) - mn)/(mx - mn), and
    ridge-fit the inverse x -> u on those synthetic pairs. No data, no
    labels — just the sensor model.

    Returns (R, c) with ``readout(x) = x @ R.T + c`` ~ sin-phases in the
    TRUE oscillator order: the differentiable, jit-safe anchor for
    ``train.losses.loss_batch(anchor=...)`` (the lstsq inversion in
    invert_lift_phases is exact but host-side; this is its in-graph
    twin, measured R^2 ~0.99 on real trajectories —
    benchmarks/diag_kuramoto_warm.json).
    """
    W, b = lift["W"], lift["b"]
    n_osc = W.shape[0]
    rng = np.random.default_rng(seed)
    u = np.sin(rng.uniform(-np.pi, np.pi, (n_samples, n_osc)))
    y = np.maximum(u @ W + b, 0.0)
    y = (y - lift["mn"]) / (lift["mx"] - lift["mn"])
    ym, um = y.mean(0), u.mean(0)
    yc = y - ym
    Rt = np.linalg.solve(yc.T @ yc + lam * np.eye(y.shape[1]),
                         yc.T @ (u - um))               # (input_dim, n_osc)
    R = Rt.T
    c = um - ym @ Rt
    return R.astype(np.float32), c.astype(np.float32)


def estimate_omega_k(phi, deltas, dt=0.1):
    """Per-trajectory (omega, K) by least squares on the KNOWN dynamics
    residual: the Kuramoto RHS is linear in its two mechanistic
    parameters, dphi_i/dt - delta_i = omega + K * c_i(t) with
    c_i(t) = (1/N) sum_j sin(phi_j - phi_i), so given inverted phases
    (invert_lift_phases) both recover by a 2-column lstsq per
    trajectory. Measured on the spread-0.5 campaign data: omega corr
    1.000 / err 0.000, K corr 0.996 / err 0.0014
    (benchmarks/diag_kuramoto_warm.json) — unsupervised, from the known
    observation map and the known dynamics FORM only.

    phi: (n, T, N) unwrapped phases; deltas: (N,) the fixed
    per-oscillator frequency offsets of the dynamics spec.
    Returns (omega_hat, k_hat), each (n,).
    """
    n, T, N = phi.shape
    dphi = np.diff(phi, axis=1) / dt                    # (n, T-1, N)
    mid = 0.5 * (phi[:, 1:] + phi[:, :-1])
    diff = mid[..., None, :] - mid[..., :, None]        # phi_j - phi_i
    c = np.sin(diff).sum(-1) / N                        # (n, T-1, N)
    om = np.empty(n, np.float64)
    kk = np.empty(n, np.float64)
    for i in range(n):
        y = (dphi[i] - np.asarray(deltas)[None, :]).ravel()
        A = np.stack([np.ones_like(c[i].ravel()), c[i].ravel()], 1)
        om[i], kk[i] = np.linalg.lstsq(A, y, rcond=None)[0]
    return om.astype(np.float32), kk.astype(np.float32)


if __name__ == "__main__":
    main()
