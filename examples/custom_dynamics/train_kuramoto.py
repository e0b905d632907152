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


if __name__ == "__main__":
    main()
