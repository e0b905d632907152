"""GOKU-net pendulum tutorial — build every layer by hand.

The runnable equivalent of the reference's tutorial notebook
(examples/tutorial/GOKU-net_pendulum_tutorial.ipynb), which constructs each
default layer manually (cells 19-33) and then trains with the same
loss/annealing loop (cells 37-45). Walk through this file top to bottom to
see exactly what `default_layers` + `Trainer` do for you.

Run: python examples/tutorial/tutorial.py  (a few minutes on CPU;
seconds on TPU)
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "pendulum"))

import latentdiffeq as ldq
from latentdiffeq import nn
from latentdiffeq.models import GOKUBasic, LatentDiffEqModel
from latentdiffeq.train import (Trainer, TrainConfig, frange_cycle_linear,
                                loss_batch, splitobs)

# ---------------------------------------------------------------------
# 1. The mechanistic latent dynamics: a pendulum with unknown length L.
#    (reference notebook cell 5)
# ---------------------------------------------------------------------
G = 10.0


def pendulum_f(u, p, t):
    return jnp.stack([u[1], -G / p[0] * jnp.sin(u[0])])


diffeq = ldq.models.ODEDynamics(
    f=pendulum_f, z_dim=2, theta_dim=1,
    solver=ldq.Tsit5(),
    sensealg=ldq.Unrolled(),                       # discretize-then-optimize
    options=ldq.make_options(adaptive=False, substeps=1),
)

# ---------------------------------------------------------------------
# 2. Data: 450 videos of 100 28x28 frames (reference cells 7-13).
# ---------------------------------------------------------------------
from create_data import load_or_generate  # noqa: E402

latent, u0s, ps, frames = load_or_generate()
x = frames.reshape(frames.shape[0], frames.shape[1], -1)
train_set, val_set = splitobs(x, 0.9)
input_dim = x.shape[-1]
print(f"data: {x.shape}, train {train_set.shape[0]}, val {val_set.shape[0]}")

# ---------------------------------------------------------------------
# 3. Build every encoder layer by hand (reference cells 19-26).
# ---------------------------------------------------------------------
key = jax.random.PRNGKey(333)
ks = iter(jax.random.split(key, 24))
init = nn.default_init          # kaiming_uniform(gain=1/sqrt(3))

hidden, rnn_in, rnn_out, latent_dim = 200, 32, 16, 16

# feature extractor: a "resnet" MLP applied framewise
feature_extractor = nn.Chain(layers=(
    nn.Dense.init(next(ks), input_dim, hidden, nn.relu, winit=init),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.Dense.init(next(ks), hidden, rnn_in, nn.relu, winit=init),
))

# pattern extractor: backward RNN for z0; bidirectional LSTM for theta
pe_z0 = nn.Recurrent.rnn(next(ks), rnn_in, (rnn_out, rnn_out), nn.relu,
                         winit=init)
pe_theta_fwd = nn.Recurrent.lstm(next(ks), rnn_in, (rnn_out, rnn_out),
                                 winit=init)
pe_theta_bwd = nn.Recurrent.lstm(next(ks), rnn_in, (rnn_out, rnn_out),
                                 winit=init)

# latent_in: four heads -> (z0_mu, z0_logvar, theta_mu, theta_logvar)
latent_in = (
    nn.Dense.init(next(ks), rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), 2 * rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), 2 * rnn_out, latent_dim, winit=init),
)
encoder_layers = (feature_extractor, (pe_z0, pe_theta_fwd, pe_theta_bwd),
                  latent_in)

# ---------------------------------------------------------------------
# 4. Decoder layers (reference cells 28-33).
# ---------------------------------------------------------------------
lo_z0 = nn.mlp(next(ks), (latent_dim, 200, diffeq.z_dim), nn.relu,
               nn.identity, winit=init)
lo_theta = nn.mlp(next(ks), (latent_dim, 200, diffeq.theta_dim), nn.relu,
                  nn.softplus, winit=init)   # softplus keeps L positive
reconstructor = nn.Chain(layers=(
    nn.Dense.init(next(ks), diffeq.z_dim, hidden, nn.relu, winit=init),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.Dense.init(next(ks), hidden, input_dim, nn.sigmoid, winit=init),
))
decoder_layers = ((lo_z0, lo_theta), diffeq, reconstructor)

model = LatentDiffEqModel.build(GOKUBasic(), encoder_layers, decoder_layers)

# ---------------------------------------------------------------------
# 5. One manual forward + loss (reference cells 37-40).
# ---------------------------------------------------------------------
t = jnp.arange(50, dtype=jnp.float32) * 0.05
xb = jnp.asarray(train_set[:8, 25:75])
# always jit model forwards (eager per-op dispatch is slow on remote TPUs)
loss, metrics = jax.jit(
    lambda m, x_: loss_batch(m, x_, t, beta=0.5, variational=True,
                             key=jax.random.PRNGKey(0)))(model, xb)
print("initial loss:", float(loss), "| KL:", float(metrics["kl"]),
      "| solver RHS evals:", int(metrics["n_rhs_evals"]))

# the annealing schedule the trainer uses (reference cell 43)
beta_schedule = frange_cycle_linear(1500, 0.0, 1.0, 4, 0.9)
print("beta ramps over", int((beta_schedule < 1.0).sum()), "of 1500 epochs")

# ---------------------------------------------------------------------
# 6. Train (reference cell 45). 20 epochs here; crank it up for real runs.
# ---------------------------------------------------------------------
cfg = TrainConfig(epochs=1500, seed=333, save_best=False)
trainer = Trainer(model, cfg)
trainer.fit(train_set, val_set, epochs=20)
print("done — val loss:", trainer.history[-1]["val_loss"])
