"""Per-epoch visualization.

Rebuilds the reference's ``visualize_val_image`` (examples/
pendulum_friction-less/model_train.jl:244-290): pick a random validation
sample and window, run the model non-variationally, then plot (a) inferred
vs. true latent angle on twin axes and (b) a true-vs-predicted frame mosaic
(every 6th frame) annotated with the true and inferred pendulum lengths.
"""
from __future__ import annotations

import os

import jax
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["visualize_val_image"]


def visualize_val_image(model, val_set, val_latent, val_ps, *, vis_len: int,
                        dt: float, h: int, w: int, path: str,
                        rng: Optional[np.random.Generator] = None):
    """``val_set``: (n, T, pixels); ``val_latent``: (n, T, 2);
    ``val_ps``: (n, 1). Saves a figure to ``path``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = rng or np.random.default_rng()
    j = int(rng.integers(0, val_set.shape[0]))
    full = val_set.shape[1]
    vis_len = min(vis_len, full)
    s = int(rng.integers(0, max(full - vis_len, 1)))

    x = jnp.asarray(val_set[j:j + 1, s:s + vis_len])
    true_latent = val_latent[j, s:s + vis_len]
    true_p = float(np.asarray(val_ps[j]).ravel()[0])

    t = jnp.arange(vis_len, dtype=jnp.float32) * dt
    # jit the forward: eager per-op dispatch is pathological through a
    # remote-TPU tunnel (thousands of tiny RPCs for the T-step scans)
    (x_hat, z_hat, l_hat), mu, logvar, aux = jax.jit(
        lambda m, xv: m(xv, t, variational=False,
                        key=jax.random.PRNGKey(0)))(model, x)

    theta_hat = None
    if isinstance(l_hat, tuple):
        theta_hat = float(np.asarray(l_hat[1]).ravel()[0])

    z = np.asarray(z_hat)[0]            # (T, z_dim)
    xh = np.asarray(x_hat)[0]           # (T, pixels)
    xx = np.asarray(x)[0]

    fig = plt.figure(figsize=(8, 6))
    ax1 = fig.add_subplot(2, 1, 1)
    ax1.plot(z[:, 0], color="indigo")
    ax1.set_ylabel("inferred angle", color="indigo")
    ax1.set_xlabel("time")
    ax1.set_title("Sample from validation set")
    ax2 = ax1.twinx()
    ax2.plot(true_latent[:, 0], color="darkorange")
    ax2.set_ylabel("true angle", color="darkorange")

    # frame mosaic, every 6th frame (model_train.jl:269-271)
    sel = np.arange(0, vis_len, 6)
    mosaic = np.concatenate([
        np.concatenate([xx[i].reshape(h, w) for i in sel], axis=1),
        np.concatenate([np.clip(xh[i].reshape(h, w), 0, 1) for i in sel],
                       axis=1),
    ], axis=0)
    ax3 = fig.add_subplot(2, 1, 2)
    ax3.imshow(mosaic, cmap="gray", vmin=0, vmax=1)
    ax3.set_axis_off()
    label = f"True Pendulum Length = {true_p:.2f}"
    if theta_hat is not None:
        label += f"   Inferred = {theta_hat:.2f}"
    ax3.set_title(label, fontsize=9, color="gray")

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
