"""Latent ODE model type (Chen et al. 2018, arXiv:1806.07366).

TPU-native rebuild of the reference's LatentODE (src/models/LatentODE.jl):
single recurrent z0 encoder over the reversed sequence, a trainable neural
vector field integrated from the sampled initial state, optional state
augmentation (ANODE).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .. import nn
from ..adjoint.odeint import odeint
from .dynamics import NeuralODEDynamics
from .template import Decoder, Encoder, ModelType

__all__ = ["LatentODE", "latent_ode_default_layers", "NODE"]


@dataclasses.dataclass(frozen=True)
class LatentODE(ModelType):
    """Reference: ``struct LatentODE <: LatentDE`` (LatentODE.jl:7)."""

    # scan-unroll factor for the encoder recurrence (identical outputs;
    # latency lever, see benchmarks/RESULTS.md)
    encoder_unroll: int = 1
    # run the NODE solve as ONE Pallas kernel with the MLP weights resident
    # in VMEM for the whole integration (ops/node_pallas.py). Identical
    # discretization: forward bit-exact vs the XLA path, gradients equal to
    # f32 rounding (in-VMEM reverse sweep accumulates in a different order;
    # tests pin both). Requires a fixed-grid f32 solve (adaptive=False,
    # interp_stride=1) and a Chain-of-Dense field. The grad step wins at
    # every field width (1.2-2.7x), the forward only for wide fields
    # (dim >~ 128) — see benchmarks/RESULTS.md "where Pallas pays".
    use_pallas_solve: bool = False

    def apply_pattern_extractor(self, encoder: Encoder, fe_out,
                                cur_len=None):
        """Single stacked RNN over the REVERSED sequence, last state
        (reference: LatentODE.jl:20-34). ``cur_len``: masked-curriculum
        mode — mask ``t < cur_len`` makes the reverse scan idle through
        the padding then consume the real prefix reversed (same final
        state as the sliced run; see GOKU.apply_pattern_extractor)."""
        mask = (None if cur_len is None
                else jnp.arange(fe_out.shape[1]) < cur_len)
        return encoder.pattern_extractor(fe_out, reverse=True,
                                         unroll=self.encoder_unroll,
                                         mask=mask)

    def apply_latent_in(self, encoder: Encoder, pe_out):
        """Two Dense heads -> (z0_mu, z0_logvar) (reference:
        LatentODE.jl:36-43)."""
        li_mu, li_logvar = encoder.latent_in
        return li_mu(pe_out), li_logvar(pe_out)

    def sample(self, mu, logvar, key):
        """Reparameterized sample (reference: LatentODE.jl:82-89)."""
        return mu + jax.random.normal(key, logvar.shape, logvar.dtype) \
            * jnp.exp(logvar / 2)

    def apply_latent_out(self, decoder: Decoder, l):
        """Pass through the user layer (identity in the default
        architecture; reference: LatentODE.jl:54,149)."""
        return decoder.latent_out(l)

    def diffeq_layer(self, decoder: Decoder, z0_hat, t, key=None):
        """Integrate the trainable vector field from z0_hat; augment with
        zeros if augment_dim > 0 (reference: LatentODE.jl:61-78 — but the
        NeuralODE is not rebuilt per call, and the solve is batched
        on-chip)."""
        de: NeuralODEDynamics = decoder.diffeq
        if de.augment_dim > 0:
            pad = jnp.zeros(z0_hat.shape[:-1] + (de.augment_dim,),
                            z0_hat.dtype)
            z0_hat = jnp.concatenate([z0_hat, pad], axis=-1)

        # solver integrates in float32 even under bf16 mixed precision
        in_dtype = z0_hat.dtype
        if in_dtype != jnp.float32:
            z0_hat = z0_hat.astype(jnp.float32)

        def f(u, p, t_):
            return p(u.astype(in_dtype)).astype(jnp.float32)

        if self.use_pallas_solve:
            if de.options.adaptive or de.options.interp_stride != 1:
                raise ValueError(
                    "LatentODE(use_pallas_solve=True) requires a fixed-grid "
                    "solve: options.adaptive=False, interp_stride=1 "
                    "(ops/node_pallas.py)")
            if in_dtype != jnp.float32:
                # the reference path evaluates the field in the model dtype
                # (p(u.astype(in_dtype))); the kernel computes in f32
                # throughout, which silently changes bf16 trajectories —
                # refuse instead of diverging
                raise ValueError(
                    "use_pallas_solve supports float32 models only (the "
                    f"kernel would change {in_dtype} numerics); use the "
                    "default XLA path for bf16 mixed precision")
            from ..ops import pallas_solve_neural_field
            ys, success, stats = pallas_solve_neural_field(
                de.dudt, de.solver, z0_hat, t,
                substeps=de.options.substeps)
        else:
            ys, success, stats = jax.vmap(
                lambda u0: odeint(f, de.solver, u0, de.dudt, t,
                                  de.options, de.sensealg)
            )(z0_hat)
        ys = jnp.where(success[:, None, None], ys, jnp.nan)
        if de.transform is not None:
            ys = de.transform(ys)
        ys = ys.astype(in_dtype)
        aux = {"success": success,
               "stats": jax.tree_util.tree_map(jnp.sum, stats)}
        return ys, aux


def NODE(key, latent_dim_in: int, *, hidden_dim: int = 200,
         augment_dim: int = 0, activation: Callable = nn.relu,
         solver=None, sensealg=None, options=None,
         init=nn.default_init, dtype=jnp.float32) -> NeuralODEDynamics:
    """The reference's NODE spec (examples/pendulum_friction-less/nODE.jl:13-31):
    dudt = Dense(in+aug, hidden, relu) -> Dense(hidden, hidden, relu) ->
    Dense(hidden, in+aug), Tsit5 solver."""
    from ..adjoint.modes import Unrolled
    from ..adjoint.odeint import SolveOptions
    from ..solve.rk import Tsit5

    dim = latent_dim_in + augment_dim
    dudt = nn.mlp(key, (dim, hidden_dim, hidden_dim, dim), activation,
                  nn.identity, winit=init, dtype=dtype)
    return NeuralODEDynamics(
        dudt=dudt, latent_dim_in=latent_dim_in, augment_dim=augment_dim,
        solver=solver if solver is not None else Tsit5(),
        sensealg=sensealg if sensealg is not None else Unrolled(),
        options=options if options is not None else SolveOptions(),
    )


def latent_ode_default_layers(key, input_dim: int,
                              diffeq: NeuralODEDynamics, *,
                              hidden_dim_resnet: int = 200,
                              rnn_input_dim: int = 32,
                              rnn_output_dim: int = 32,
                              output_activation: Callable = nn.sigmoid,
                              init=nn.default_init, dtype=jnp.float32):
    """Default LatentODE architecture (reference: LatentODE.jl:100-152)."""
    from ..core import Identity

    latent_dim_in = diffeq.latent_dim_in
    latent_dim_out = diffeq.latent_dim_out
    ks = jax.random.split(key, 5)

    feature_extractor = nn.resnet_mlp(
        ks[0], input_dim, hidden_dim_resnet, rnn_input_dim,
        nn.relu, nn.relu, winit=init, dtype=dtype)
    pattern_extractor = nn.Recurrent.rnn(
        ks[1], rnn_input_dim, (rnn_output_dim, rnn_output_dim), nn.relu,
        winit=init, dtype=dtype)
    latent_in = (
        nn.Dense.init(ks[2], rnn_output_dim, latent_dim_in, winit=init,
                      dtype=dtype),
        nn.Dense.init(ks[3], rnn_output_dim, latent_dim_in, winit=init,
                      dtype=dtype),
    )
    encoder_layers = (feature_extractor, pattern_extractor, latent_in)

    reconstructor = nn.resnet_mlp(
        ks[4], latent_dim_out, hidden_dim_resnet, input_dim,
        nn.relu, output_activation, winit=init, dtype=dtype)
    decoder_layers = (Identity(), diffeq, reconstructor)

    return encoder_layers, decoder_layers
