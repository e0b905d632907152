"""GOKU on Van der Pol trajectories with learned mu (BASELINE.json
config 4: "user-defined mechanistic latent dynamics template").

The observations are a random linear+relu lift of the 2-d state to
``input_dim`` channels — the standard synthetic setup for testing that the
encoder recovers (z0, theta) through a nontrivial observation map.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from custom import VanDerPol  # noqa: E402

from latentdiffeq import ODEProblem, make_options, solve_ensemble  # noqa: E402
from latentdiffeq.models import (GOKUBasic, LatentDiffEqModel,  # noqa: E402
                                 default_layers)
from latentdiffeq.train import TrainConfig, Trainer, splitobs  # noqa: E402


def make_data(n_traj=256, T=100, dt=0.1, input_dim=64, seed=0,
              mu_max=2.0, stochastic_sigma=0.0):
    """``mu_max=2`` keeps mu in the weakly-nonlinear regime (period is
    nearly mu-independent there — mu is hard to identify from the
    waveform); ``mu_max=4`` reaches relaxation oscillations where the
    period grows with mu, the identifiable regime (see
    benchmarks/quality_vdp.py).

    ``stochastic_sigma > 0``: generate from the MULTIPLICATIVE-noise SDE
    du = f dt + sigma*u dW (custom.StochasticVanDerPol) instead of the
    ODE — the diagonal-noise workload the SRIW1/SOSRI solver covers; the
    returned diffeq spec is then the SDE spec."""
    rng = np.random.default_rng(seed)
    u0s = rng.uniform(-2.0, 2.0, (n_traj, 2)).astype(np.float32)
    mus = rng.uniform(0.5, mu_max, (n_traj, 1)).astype(np.float32)
    saveat = jnp.arange(T, dtype=jnp.float32) * dt
    if stochastic_sigma > 0.0:
        from custom import StochasticVanDerPol
        from latentdiffeq import SDEProblem
        svdp = StochasticVanDerPol(sigma=stochastic_sigma)
        prob = SDEProblem(f=svdp.f, g=svdp.g, u0=jnp.asarray(u0s[0]),
                          tspan=(0.0, float(saveat[-1])),
                          p=jnp.asarray(mus[0]))
        sol = solve_ensemble(prob, svdp.solver, u0s=jnp.asarray(u0s),
                             ps=jnp.asarray(mus), saveat=saveat,
                             key=jax.random.PRNGKey(seed), substeps=4)
        vdp = svdp
    else:
        vdp = VanDerPol(options=make_options(adaptive=False, substeps=4))
        prob = ODEProblem(f=vdp.f, u0=jnp.asarray(u0s[0]),
                          tspan=(0.0, float(saveat[-1])),
                          p=jnp.asarray(mus[0]))
        sol = solve_ensemble(prob, vdp.solver, u0s=jnp.asarray(u0s),
                             ps=jnp.asarray(mus), saveat=saveat)
    z = np.asarray(sol.ys)                       # (n, T, 2)
    W = rng.normal(0, 1, (2, input_dim)).astype(np.float32)
    b = rng.normal(0, 0.3, (input_dim,)).astype(np.float32)
    x = np.maximum(z @ W + b, 0.0)               # fixed random observation map
    x = (x - x.min()) / (x.max() - x.min())
    return x.astype(np.float32), z, mus, vdp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--input-dim", type=int, default=64)
    args = ap.parse_args()

    x, z, mus, vdp = make_data(input_dim=args.input_dim)
    train_set, val_set = splitobs(x, 0.9)

    enc, dec = default_layers(jax.random.PRNGKey(0), GOKUBasic(),
                              args.input_dim, vdp, hidden_dim_resnet=100,
                              latent_to_diffeq_dim=100)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    cfg = TrainConfig(epochs=args.epochs, batch_size=64, seq_len=50,
                      dt=0.1, seed=7,
                      checkpoint_dir=os.path.join(
                          os.path.dirname(os.path.abspath(__file__)),
                          "output_vdp"))
    Trainer(model, cfg).fit(train_set, val_set)


if __name__ == "__main__":
    main()
