"""GOKU-net model type (Linial et al. 2020, arXiv:2003.10775).

TPU-native rebuild of the reference's GOKU implementation
(src/models/GOKU.jl). The encoder infers BOTH a latent initial state z0 and
latent mechanistic parameters theta; the decoder maps them to the ODE's
state/parameter space, solves the batched ODE on-chip (one vmapped solve —
replacing the reference's forced-CPU EnsembleThreads round-trip,
GOKU.jl:101-128), and reconstructs frames.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .. import nn
from ..adjoint.odeint import odeint
from ..solve.sde import solve_sde_adaptive, solve_sde_fixed_grid
from .dynamics import ODEDynamics, SDEDynamics
from .template import Decoder, Encoder, ModelType

__all__ = ["GOKU", "GOKUBasic", "goku_default_layers"]


class GOKU(ModelType):
    """Abstract GOKU behavior (reference: ``abstract type GOKU <: LatentDE``,
    GOKU.jl:6). Subclass and override hooks to customize stages."""

    # Pallas kernel switches (subclass overrides; see GOKUBasic fields)
    use_pallas_encoder: bool = False
    use_pallas_solver: bool = False
    # scan-unroll factor for the encoder recurrences (identical outputs;
    # shortens the sequential issue chain — see benchmarks/RESULTS.md)
    encoder_unroll: int = 1

    def apply_pattern_extractor(self, encoder: Encoder, fe_out,
                                cur_len=None):
        """z0 head: stacked RNN over the REVERSED sequence (last state);
        theta head: bidirectional stacked LSTM (forward last state ++
        backward last state). Reference: GOKU.jl:30-49.

        With ``use_pallas_encoder`` the heads run as a single Pallas
        kernel with weights and states resident in VMEM.

        ``cur_len`` (masked curriculum): only frames [0, cur_len) are
        real. One shared update-mask ``t < cur_len`` gives every head the
        same final state as running on the sliced prefix: the forward
        LSTM freezes after the prefix, and the two reverse-scanned heads
        idle through the padding (state = learned init) before consuming
        the reversed real frames down to t=0."""
        pe_z0, pe_theta_fwd, pe_theta_bwd = encoder.pattern_extractor
        if self.use_pallas_encoder and cur_len is None:
            from ..ops.recurrent_pallas import pallas_goku_heads
            return pallas_goku_heads(pe_z0, pe_theta_fwd, pe_theta_bwd,
                                     fe_out)
        mask = (None if cur_len is None
                else jnp.arange(fe_out.shape[1]) < cur_len)
        z0_out = pe_z0(fe_out, reverse=True, unroll=self.encoder_unroll,
                       mask=mask)
        th_f = pe_theta_fwd(fe_out, unroll=self.encoder_unroll, mask=mask)
        th_b = pe_theta_bwd(fe_out, reverse=True,
                            unroll=self.encoder_unroll, mask=mask)
        return z0_out, jnp.concatenate([th_f, th_b], axis=-1)

    def apply_latent_in(self, encoder: Encoder, pe_out):
        """Four Dense heads -> ((z0_mu, theta_mu), (z0_logvar, theta_logvar)).
        Reference: GOKU.jl:61-72."""
        z0_out, th_out = pe_out
        li_mu_z0, li_logvar_z0, li_mu_th, li_logvar_th = encoder.latent_in
        return ((li_mu_z0(z0_out), li_mu_th(th_out)),
                (li_logvar_z0(z0_out), li_logvar_th(th_out)))

    def sample(self, mu, logvar, key):
        """Reparameterized sampling of the (z0, theta) tuple
        (reference: GOKU.jl:155-163)."""
        (z0_mu, th_mu), (z0_lv, th_lv) = mu, logvar
        k1, k2 = jax.random.split(key)
        z0 = z0_mu + jax.random.normal(k1, z0_lv.shape, z0_lv.dtype) \
            * jnp.exp(z0_lv / 2)
        th = th_mu + jax.random.normal(k2, th_lv.shape, th_lv.dtype) \
            * jnp.exp(th_lv / 2)
        return z0, th

    def apply_latent_out(self, decoder: Decoder, l):
        """Two MLPs: latent -> ODE state z0_hat, latent -> ODE params
        theta_hat (reference: GOKU.jl:83-91)."""
        z0_tilde, th_tilde = l
        lo_z0, lo_th = decoder.latent_out
        return lo_z0(z0_tilde), lo_th(th_tilde)

    def diffeq_layer(self, decoder: Decoder, l_hat, t, key=None):
        """Batched on-chip solve from per-sample (z0_hat, theta_hat)
        (replaces reference GOKU.jl:98-130: cpu() round-trip +
        EnsembleProblem + EnsembleThreads + NaN-fill + permutedims).
        Failed trajectories are NaN-filled so shapes match (GOKU.jl:113-114).
        """
        z0_hat, th_hat = l_hat
        de = decoder.diffeq

        # Mixed precision: the NN stages may run in bfloat16 (MXU-native),
        # but the solve always integrates in float32 — RK stage arithmetic
        # and error control need the mantissa. Cast in, cast back.
        in_dtype = z0_hat.dtype
        if in_dtype != jnp.float32:
            z0_hat = z0_hat.astype(jnp.float32)
            th_hat = th_hat.astype(jnp.float32)

        if isinstance(de, SDEDynamics):
            if key is None:
                raise ValueError("SDE dynamics require a PRNG `key` "
                                 "(pass key= to the model call)")
            batch = z0_hat.shape[0]
            keys = jax.random.split(key, batch)
            if de.adaptive:
                # per-trajectory dyadic adaptive stepping — the reference's
                # SOSRI() semantics (pendulum.jl:103 via GOKU.jl:121)
                ys, success, stats = jax.vmap(
                    lambda u0, p, k: solve_sde_adaptive(
                        de.f, de.g, de.solver, u0, p, t, k,
                        cfg=de.adaptive_cfg)
                )(z0_hat, th_hat, keys)
            else:
                ys, success, stats = jax.vmap(
                    lambda u0, p, k: solve_sde_fixed_grid(
                        de.f, de.g, de.solver, u0, p, t, k,
                        substeps=de.substeps)
                )(z0_hat, th_hat, keys)
        elif (self.use_pallas_solver and isinstance(de, ODEDynamics)
              and not de.options.adaptive):
            from ..ops.ode_pallas import pallas_solve_fixed_grid_batched
            ys, success, stats = pallas_solve_fixed_grid_batched(
                de.f, de.solver, z0_hat, th_hat, t,
                substeps=de.options.substeps)
        else:
            ys, success, stats = jax.vmap(
                lambda u0, p: odeint(de.f, de.solver, u0, p, t,
                                     de.options, de.sensealg)
            )(z0_hat, th_hat)

        ys = jnp.where(success[:, None, None], ys, jnp.nan)
        if de.transform is not None:
            ys = de.transform(ys)
        ys = ys.astype(in_dtype)
        aux = {"success": success,
               "stats": jax.tree_util.tree_map(jnp.sum, stats)}
        return ys, aux


@dataclasses.dataclass(frozen=True)
class GOKUBasic(GOKU):
    """The concrete default GOKU variant (reference: ``struct GOKU_basic``,
    GOKU.jl:7). The pallas flags select the fused TPU kernels for the
    encoder recurrences and the batched ODE solve."""

    use_pallas_encoder: bool = False
    use_pallas_solver: bool = False
    encoder_unroll: int = 1


def goku_default_layers(key, input_dim: int, diffeq, *,
                        hidden_dim_resnet: int = 200,
                        rnn_input_dim: int = 32,
                        rnn_output_dim: int = 16,
                        latent_dim_z0: int = 16,
                        latent_dim_theta: int = 16,
                        latent_to_diffeq_dim: int = 200,
                        general_activation: Callable = nn.relu,
                        z0_activation: Callable = nn.identity,
                        theta_activation: Callable = nn.softplus,
                        output_activation: Callable = nn.sigmoid,
                        init=nn.default_init, dtype=jnp.float32):
    """Default GOKU architecture (reference: GOKU.jl:199-274).

    Returns ``(encoder_layers, decoder_layers)`` for
    ``LatentDiffEqModel.build(GOKUBasic(), ...)``.
    """
    z_dim = diffeq.z_dim
    theta_dim = diffeq.theta_dim
    ks = jax.random.split(key, 11)

    # --- encoder (GOKU.jl:210-245) ---
    feature_extractor = nn.resnet_mlp(
        ks[0], input_dim, hidden_dim_resnet, rnn_input_dim,
        general_activation, general_activation, winit=init, dtype=dtype)

    pe_z0 = nn.Recurrent.rnn(ks[1], rnn_input_dim,
                             (rnn_output_dim, rnn_output_dim),
                             nn.relu, winit=init, dtype=dtype)
    pe_theta_fwd = nn.Recurrent.lstm(ks[2], rnn_input_dim,
                                     (rnn_output_dim, rnn_output_dim),
                                     winit=init, dtype=dtype)
    pe_theta_bwd = nn.Recurrent.lstm(ks[3], rnn_input_dim,
                                     (rnn_output_dim, rnn_output_dim),
                                     winit=init, dtype=dtype)
    pattern_extractor = (pe_z0, pe_theta_fwd, pe_theta_bwd)

    latent_in = (
        nn.Dense.init(ks[4], rnn_output_dim, latent_dim_z0, winit=init,
                      dtype=dtype),
        nn.Dense.init(ks[5], rnn_output_dim, latent_dim_z0, winit=init,
                      dtype=dtype),
        nn.Dense.init(ks[6], rnn_output_dim * 2, latent_dim_theta,
                      winit=init, dtype=dtype),
        nn.Dense.init(ks[7], rnn_output_dim * 2, latent_dim_theta,
                      winit=init, dtype=dtype),
    )
    encoder_layers = (feature_extractor, pattern_extractor, latent_in)

    # --- decoder (GOKU.jl:248-271) ---
    lo_z0 = nn.mlp(ks[8], (latent_dim_z0, latent_to_diffeq_dim, z_dim),
                   general_activation, z0_activation, winit=init, dtype=dtype)
    lo_theta = nn.mlp(ks[10], (latent_dim_theta, latent_to_diffeq_dim,
                               theta_dim),
                      general_activation, theta_activation, winit=init,
                      dtype=dtype)
    latent_out = (lo_z0, lo_theta)

    reconstructor = nn.resnet_mlp(
        ks[9], z_dim, hidden_dim_resnet, input_dim,
        general_activation, output_activation, winit=init, dtype=dtype)
    decoder_layers = (latent_out, diffeq, reconstructor)

    return encoder_layers, decoder_layers
