"""GOKU-net pendulum tutorial — build every layer by hand.

The runnable equivalent of the reference's 46-cell tutorial notebook
(examples/tutorial/GOKU-net_pendulum_tutorial.ipynb): what a GOKU-net is,
how the pendulum video data is made, every encoder/decoder layer built and
shape-checked by hand (reference cells 19-33), one manual forward through
each stage, the annealed ELBO loss, a live training run (cells 37-45), and
the standard visualization figure.

`latentdiffeq.models.default_layers` + `Trainer` do all of this for you in
four lines — walk this file top to bottom to see exactly what they do.

Run: python examples/tutorial/tutorial.py  (a few minutes on CPU; seconds
on TPU). `make_notebook.py` turns it into the executed .ipynb.
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

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# ---------------------------------------------------------------------
# 1. What a GOKU-net is.
#
# A GOKU-net (Linial et al. 2020) is a VAE whose latent space is governed
# by a KNOWN mechanistic differential equation with UNKNOWN per-sample
# parameters. For pendulum videos: the encoder watches frames and infers
# both the initial state (angle, velocity) AND the pendulum length L; the
# decoder solves the pendulum ODE forward and renders frames back. The
# physics is the inductive bias — the model identifies interpretable
# mechanistic parameters from pixels. (reference notebook cells 1-5)
# ---------------------------------------------------------------------
G = 10.0


def pendulum_f(u, p, t):
    # du1 = u2 ; du2 = -G/L sin(u1), with theta = [L] learned per sample
    return jnp.stack([u[1], -G / p[0] * jnp.sin(u[0])])


diffeq = ldq.models.ODEDynamics(
    f=pendulum_f, z_dim=2, theta_dim=1,
    solver=ldq.Tsit5(),
    sensealg=ldq.Unrolled(),                       # discretize-then-optimize
    options=ldq.make_options(adaptive=False, substeps=1),
)
print(f"latent ODE state dim {diffeq.z_dim}, mechanistic params "
      f"{diffeq.theta_dim} (the unknown length L)")

# ---------------------------------------------------------------------
# 2. Data: 450 videos of 100 28x28 frames (reference cells 7-13).
#
# Each trajectory draws L ~ U(1, 2) and u0 ~ U; the ODE ensemble is solved
# on-chip and every state is rasterized to a 28x28 frame by the
# anti-aliased rod renderer (the Luxor role). NOTE the rendered rod length
# is FIXED at 19 px — L is recoverable from the DYNAMICS only (the
# oscillation frequency ~ sqrt(G/L)), which is exactly what makes this an
# identification benchmark and not a geometry-reading task.
# ---------------------------------------------------------------------
from create_data import load_or_generate  # noqa: E402

latent, u0s, ps, frames = load_or_generate()
x = frames.reshape(frames.shape[0], frames.shape[1], -1)
train_set, val_set = splitobs(x, 0.9)
input_dim = x.shape[-1]
print(f"frames {frames.shape} -> flattened {x.shape}; "
      f"train {train_set.shape[0]}, val {val_set.shape[0]}")
print(f"L range: [{ps.min():.2f}, {ps.max():.2f}]")

# ---------------------------------------------------------------------
# 2b. Look at the data: one trajectory, every 12th frame. The rod length
#     on screen never changes — only the swing dynamics carry L.
# ---------------------------------------------------------------------
fig, axes = plt.subplots(1, 8, figsize=(12, 2))
for k, ax in enumerate(axes):
    ax.imshow(frames[0, 12 * k], cmap="gray_r")
    ax.set_title(f"t={12 * k}", fontsize=8)
    ax.axis("off")
fig.suptitle(f"trajectory 0: L = {float(ps[0, 0]):.2f}")
fig.tight_layout()

# ---------------------------------------------------------------------
# 3. Encoder stage 1 — the feature extractor (reference cells 19-21).
#
# A framewise "resnet MLP": pixels -> 200 -> (+skip) -> (+skip) -> 32.
# It runs on every frame independently (one big batched matmul on the
# MXU), compressing 784 pixels to a 32-dim feature per frame.
# ---------------------------------------------------------------------
key = jax.random.PRNGKey(333)
ks = iter(jax.random.split(key, 24))
init = nn.default_init          # kaiming_uniform(gain=1/sqrt(3)), Flux's

hidden, rnn_in, rnn_out, latent_dim = 200, 32, 16, 16

feature_extractor = nn.Chain(layers=(
    nn.Dense.init(next(ks), input_dim, hidden, nn.relu, winit=init),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.Dense.init(next(ks), hidden, rnn_in, nn.relu, winit=init),
))

xb_demo = jnp.asarray(train_set[:4, :50])          # (batch=4, T=50, 784)
# NOTE: pass the layer as a traced ARGUMENT (modules are pytrees of
# weights — hashing them as the jitted callable itself would fail)
fe_out = jax.jit(lambda m, h: m(h))(feature_extractor, xb_demo)
print(f"feature extractor: {xb_demo.shape} -> {fe_out.shape}")
assert fe_out.shape == (4, 50, rnn_in)

# ---------------------------------------------------------------------
# 4. Encoder stage 2 — the pattern extractor (reference cells 22-24).
#
# Two recurrences, run where their information lives:
# - z0 head: a stacked RNN over the REVERSED sequence — its last state
#   has seen frame 0 most recently, right where the initial state is.
# - theta head: a bidirectional stacked LSTM — L is a property of the
#   WHOLE swing, so both directions' final states are concatenated.
# ---------------------------------------------------------------------
pe_z0 = nn.Recurrent.rnn(next(ks), rnn_in, (rnn_out, rnn_out), nn.relu,
                         winit=init)
pe_theta_fwd = nn.Recurrent.lstm(next(ks), rnn_in, (rnn_out, rnn_out),
                                 winit=init)
pe_theta_bwd = nn.Recurrent.lstm(next(ks), rnn_in, (rnn_out, rnn_out),
                                 winit=init)

z0_feat = jax.jit(lambda m, h: m(h, reverse=True))(pe_z0, fe_out)
th_f = jax.jit(lambda m, h: m(h))(pe_theta_fwd, fe_out)
th_b = jax.jit(lambda m, h: m(h, reverse=True))(pe_theta_bwd, fe_out)
th_feat = jnp.concatenate([th_f, th_b], axis=-1)
print(f"z0 head: {fe_out.shape} -> {z0_feat.shape} (last state, reversed)")
print(f"theta head: -> {th_feat.shape} (fwd ++ bwd last states)")
assert z0_feat.shape == (4, rnn_out) and th_feat.shape == (4, 2 * rnn_out)

# ---------------------------------------------------------------------
# 5. Encoder stage 3 — latent_in: four Dense heads producing the
#    variational posterior (z0_mu, z0_logvar, theta_mu, theta_logvar)
#    (reference cells 25-26).
# ---------------------------------------------------------------------
latent_in = (
    nn.Dense.init(next(ks), rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), 2 * rnn_out, latent_dim, winit=init),
    nn.Dense.init(next(ks), 2 * rnn_out, latent_dim, winit=init),
)
z0_mu, z0_logvar = latent_in[0](z0_feat), latent_in[1](z0_feat)
th_mu, th_logvar = latent_in[2](th_feat), latent_in[3](th_feat)
print(f"posterior: z0 mu/logvar {z0_mu.shape}, theta mu/logvar "
      f"{th_mu.shape}")
encoder_layers = (feature_extractor, (pe_z0, pe_theta_fwd, pe_theta_bwd),
                  latent_in)

# ---------------------------------------------------------------------
# 6. The reparameterization trick (reference cell 37): sample
#    l = mu + eps * exp(logvar / 2) with eps ~ N(0, I), so gradients
#    flow through mu and logvar.
# ---------------------------------------------------------------------
eps = jax.random.normal(jax.random.PRNGKey(0), z0_mu.shape)
z0_tilde = z0_mu + eps * jnp.exp(z0_logvar / 2)
print(f"sampled latent z0_tilde {z0_tilde.shape}")

# ---------------------------------------------------------------------
# 7. Decoder stage 1 — latent_out: two MLPs mapping the 16-dim
#    variational latents into the ODE's coordinates: z0_hat (angle,
#    velocity) and theta_hat = L (reference cells 28-30). softplus keeps
#    L strictly positive — a pendulum with negative length isn't physics.
# ---------------------------------------------------------------------
lo_z0 = nn.mlp(next(ks), (latent_dim, 200, diffeq.z_dim), nn.relu,
               nn.identity, winit=init)
lo_theta = nn.mlp(next(ks), (latent_dim, 200, diffeq.theta_dim), nn.relu,
                  nn.softplus, winit=init)
z0_hat = lo_z0(z0_tilde)
th_hat = lo_theta(th_mu)
print(f"ODE initial state z0_hat {z0_hat.shape}, params theta_hat "
      f"{th_hat.shape}, L > 0: {bool((th_hat > 0).all())}")

# ---------------------------------------------------------------------
# 8. Decoder stage 2 — the diffeq layer: solve the pendulum ODE from
#    each sample's (z0_hat, theta_hat) (reference cells 31-32). Here the
#    reference round-trips to CPU for EnsembleThreads; on TPU the whole
#    batch solves as ONE vmapped Tsit5 scan on-chip. Demo with known
#    parameters so the trajectory is meaningful:
# ---------------------------------------------------------------------
t_grid = jnp.arange(100, dtype=jnp.float32) * 0.05
sol = ldq.solve_ensemble(
    ldq.ODEProblem(f=pendulum_f, u0=jnp.zeros(2), tspan=(0.0, 4.95),
                   p=jnp.ones(1)),
    u0s=jnp.asarray(u0s[:3]), ps=jnp.asarray(ps[:3]), saveat=t_grid,
    adaptive=False)
print(f"batched solve: ys {sol.ys.shape}, all succeeded: "
      f"{bool(sol.success.all())}, RHS evals: {int(sol.stats['n_rhs_evals'])}")

fig, ax = plt.subplots(figsize=(7, 3))
for i in range(3):
    ax.plot(np.asarray(t_grid), np.asarray(sol.ys)[i, :, 0],
            label=f"L = {float(ps[i, 0]):.2f}")
ax.set_xlabel("time [s]")
ax.set_ylabel("angle [rad]")
ax.set_title("pendulum ODE solutions — longer L, slower swing")
ax.legend()
fig.tight_layout()

# ---------------------------------------------------------------------
# 9. Decoder stage 3 — the reconstructor: another resnet MLP mapping
#    each solved state (angle, velocity) back to 784 sigmoid pixels
#    (reference cell 33).
# ---------------------------------------------------------------------
reconstructor = nn.Chain(layers=(
    nn.Dense.init(next(ks), diffeq.z_dim, hidden, nn.relu, winit=init),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.SkipConnection(nn.Dense.init(next(ks), hidden, hidden, nn.relu,
                                    winit=init)),
    nn.Dense.init(next(ks), hidden, input_dim, nn.sigmoid, winit=init),
))
decoder_layers = ((lo_z0, lo_theta), diffeq, reconstructor)

# ---------------------------------------------------------------------
# 10. Assemble the six-slot model (reference cell 35). The container
#     just wires the stages: encode -> sample -> latent_out -> solve ->
#     transform -> reconstruct, returning ((x_hat, z_hat, l_hat), mu,
#     logvar, aux).
# ---------------------------------------------------------------------
model = LatentDiffEqModel.build(GOKUBasic(), encoder_layers, decoder_layers)

t = jnp.arange(50, dtype=jnp.float32) * 0.05
xb = jnp.asarray(train_set[:8, 25:75])
# always jit model forwards (eager per-op dispatch is slow on remote TPUs)
(x_hat, z_hat, l_hat), mu, logvar, aux = jax.jit(
    lambda m, x_: m(x_, t, variational=True,
                    key=jax.random.PRNGKey(0)))(model, xb)
print(f"forward: x_hat {x_hat.shape}, latent trajectory z_hat "
      f"{z_hat.shape}, inferred L {l_hat[1].shape}")
print(f"solver successes: {int(aux['success'].sum())}/8")

# ---------------------------------------------------------------------
# 11. The loss (reference cells 38-40): per-pixel reconstruction +
#     beta * KL(posterior || N(0, I)) over BOTH latent groups.
# ---------------------------------------------------------------------
loss, metrics = jax.jit(
    lambda m, x_: loss_batch(m, x_, t, beta=0.5, variational=True,
                             key=jax.random.PRNGKey(0)))(model, xb)
print(f"initial loss {float(loss):.2f} = rec {float(metrics['rec']):.2f}"
      f" + 0.5 * kl {float(metrics['kl']):.2f} "
      f"| RHS evals {int(metrics['n_rhs_evals'])}")

# ---------------------------------------------------------------------
# 12. Cyclical KL annealing (reference cell 43): beta ramps 0 -> 1 in 4
#     cycles, holding at 1 for the last 10% of each. Early low-beta
#     phases let the reconstruction organize the latent space before the
#     prior pressure kicks in.
# ---------------------------------------------------------------------
beta_schedule = frange_cycle_linear(1500, 0.0, 1.0, 4, 0.9)
fig, ax = plt.subplots(figsize=(7, 2.2))
ax.plot(np.asarray(beta_schedule), color="slateblue")
ax.set_xlabel("epoch")
ax.set_ylabel(r"$\beta$")
ax.set_title("cyclical KL annealing schedule")
fig.tight_layout()

# ---------------------------------------------------------------------
# 13. Train (reference cell 45). The Trainer fuses whole epochs into one
#     jitted program (random window sampling, minibatching, ADAMW, full-
#     val-set loss, best tracking all on-chip). 150 epochs to watch the
#     loss move; the real flagship runs 3000 (see
#     benchmarks/quality_goku.py — angle corr 0.997, L error 0.026).
# ---------------------------------------------------------------------
cfg = TrainConfig(epochs=1500, seed=333, save_best=False,
                  epochs_per_dispatch=25)
trainer = Trainer(model, cfg)
trainer.fit(train_set, val_set, epochs=150, log_every=25)
print(f"best val loss after 150 epochs: {trainer.best_val_loss:.2f}")

fig, ax = plt.subplots(figsize=(7, 2.8))
ax.plot([h["val_loss"] for h in trainer.history], color="indigo")
ax.set_xlabel("epoch")
ax.set_ylabel("val loss")
ax.set_title("validation loss (150 tutorial epochs)")
fig.tight_layout()

# ---------------------------------------------------------------------
# 14. What convergence looks like (reference cells 44-46): the committed
#     flagship winner (benchmarks/artifacts/) decoded on a validation
#     sample — inferred vs true angle and the reconstruction mosaic.
# ---------------------------------------------------------------------
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
ckpt = os.path.join(ROOT, "benchmarks", "artifacts", "goku_best_model.npz")
if os.path.exists(ckpt):
    from latentdiffeq.train.checkpoint import load_checkpoint
    from latentdiffeq.train import optim
    from latentdiffeq.train.visualize import visualize_val_image

    opt = optim.adamw(1e-3, 0.9, 0.999, 1e-3)
    tree, meta = load_checkpoint(ckpt, {"model": model,
                                        "opt_state": opt.init(model),
                                        "key": jax.random.PRNGKey(0)})
    _, val_latent = splitobs(latent, 0.9)
    _, val_ps = splitobs(ps, 0.9)
    fig_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "converged_sample.png")
    visualize_val_image(tree["model"], np.asarray(val_set), val_latent,
                        val_ps, vis_len=60, dt=0.05, h=28, w=28,
                        path=fig_path, rng=np.random.default_rng(4))
    print(f"converged-model figure written to {fig_path} "
          f"(trained {meta.get('epoch')} epochs)")
    img = plt.imread(fig_path)
    fig = plt.figure(figsize=(8, 6))
    plt.imshow(img)
    plt.axis("off")
else:
    print("committed flagship checkpoint not found; skipping")
