"""The latent-DE model template: Encoder -> sample -> Decoder.

The reference's key architectural idea (SURVEY.md §1): a latent-DE model is a
fixed six-slot pipeline — encoder = {feature_extractor -> pattern_extractor ->
latent_in}, decoder = {latent_out -> diffeq -> reconstructor} (reference:
src/models/LatentDiffEqModel.jl:41-47, 79-99) — where every slot is a
user-swappable layer and each stage's *behavior* dispatches on a model-type
tag (GOKU / LatentODE, reference: src/LatentDiffEq.jl:11-17).

Julia's multiple dispatch becomes method dispatch here: the model type is a
hashable singleton (static pytree metadata) implementing the hook set
  apply_feature_extractor, apply_pattern_extractor, apply_latent_in,
  sample, apply_latent_out, diffeq_layer, apply_reconstructor
(the reference's hook names, GOKU.jl / LatentODE.jl). Subclass a model type
to override hooks — the same extension mechanism the Julia package offers.

Data layout is TPU-idiomatic: ``x`` is (batch, time, input_dim) — feature dim
on the lanes — instead of the reference's (input_dim, batch, time).
Randomness is explicit: pass ``key`` when ``variational=True`` (replaces
Julia's global RNG at GOKU.jl:155-173).
"""
from __future__ import annotations

from typing import Any, Optional

import jax

from ..core import module, static_field

__all__ = ["LatentDiffEqModel", "Encoder", "Decoder", "ModelType"]


class ModelType:
    """Base for model-type tags (reference: ``abstract type LatentDE``,
    src/LatentDiffEq.jl:11). Subclasses must be hashable (frozen dataclasses)
    and implement the seven hooks."""

    # -- encoder hooks ------------------------------------------------------
    def apply_feature_extractor(self, encoder: "Encoder", x):
        return encoder.feature_extractor(x)

    def apply_pattern_extractor(self, encoder: "Encoder", fe_out,
                                cur_len=None):
        """``cur_len`` (optional traced int32): only the first ``cur_len``
        frames of ``fe_out`` are real — the rest is padding to keep shapes
        static (masked-curriculum mode, TrainConfig.masked_curriculum).
        Implementations must produce the same encoding as running on
        ``fe_out[:, :cur_len]``."""
        raise NotImplementedError

    def apply_latent_in(self, encoder: "Encoder", pe_out):
        raise NotImplementedError

    # -- sampling -----------------------------------------------------------
    def sample(self, mu, logvar, key):
        raise NotImplementedError

    # -- decoder hooks ------------------------------------------------------
    def apply_latent_out(self, decoder: "Decoder", l):
        raise NotImplementedError

    def diffeq_layer(self, decoder: "Decoder", l_hat, t, key=None):
        """Returns (z_traj, aux) with z_traj: (batch, time, z_dim) and aux a
        dict carrying per-sample ``success`` and solver ``stats``."""
        raise NotImplementedError

    def apply_reconstructor(self, decoder: "Decoder", z):
        return decoder.reconstructor(z)


@module
class Encoder:
    """feature_extractor -> pattern_extractor -> latent_in
    (reference: src/models/LatentDiffEqModel.jl:41-75)."""

    feature_extractor: Any
    pattern_extractor: Any
    latent_in: Any
    model_type: ModelType = static_field(default=None)

    def __call__(self, x, cur_len=None):
        mt = self.model_type
        fe_out = mt.apply_feature_extractor(self, x)
        pe_out = mt.apply_pattern_extractor(self, fe_out, cur_len=cur_len)
        return mt.apply_latent_in(self, pe_out)


@module
class Decoder:
    """latent_out -> diffeq -> reconstructor
    (reference: src/models/LatentDiffEqModel.jl:79-113)."""

    latent_out: Any
    diffeq: Any
    reconstructor: Any
    model_type: ModelType = static_field(default=None)

    def __call__(self, l, t, key=None):
        mt = self.model_type
        l_hat = mt.apply_latent_out(self, l)
        z, aux = mt.diffeq_layer(self, l_hat, t, key=key)
        x_hat = mt.apply_reconstructor(self, z)
        return (x_hat, z, l_hat), aux


@module
class LatentDiffEqModel:
    """The generic container (reference: LatentDiffEqModel.jl:1-37).

    Construction mirrors the reference exactly:
        model = LatentDiffEqModel(model_type, encoder_layers, decoder_layers)
    with encoder_layers = (feature_extractor, pattern_extractor, latent_in)
    and decoder_layers = (latent_out, diffeq, reconstructor).

    Forward: ``model(x, t, variational=..., key=...)`` ->
    ``((x_hat, z_hat, l_hat), mu, logvar, aux)``. ``aux`` additionally
    carries the solver success flags and RHS-eval counters (the reference
    returns only the 3-tuple; see LatentDiffEqModel.jl:25-37).
    """

    encoder: Encoder
    decoder: Decoder
    model_type: ModelType = static_field(default=None)

    @staticmethod
    def build(model_type, encoder_layers, decoder_layers) -> "LatentDiffEqModel":
        fe, pe, li = encoder_layers
        lo, de, re = decoder_layers
        return LatentDiffEqModel(
            model_type=model_type,
            encoder=Encoder(feature_extractor=fe, pattern_extractor=pe,
                            latent_in=li, model_type=model_type),
            decoder=Decoder(latent_out=lo, diffeq=de, reconstructor=re,
                            model_type=model_type),
        )

    def __call__(self, x, t, *, variational: bool = False,
                 key: Optional[jax.Array] = None, cur_len=None):
        """``cur_len`` (optional traced int32): masked-curriculum mode —
        encode only the first ``cur_len`` frames of ``x`` (the rest is
        shape padding); the decoder still solves/reconstructs the full
        ``t`` grid, and the LOSS is responsible for masking frames beyond
        ``cur_len`` (train.losses.loss_batch(cur_len=...))."""
        mu, logvar = self.encoder(x, cur_len=cur_len)
        if variational:
            if key is None:
                raise ValueError("variational=True requires a PRNG `key`")
            skey, dkey = jax.random.split(key)
            l = self.model_type.sample(mu, logvar, skey)
        else:
            l, dkey = mu, key
        out, aux = self.decoder(l, t, key=dkey)
        return out, mu, logvar, aux

    def forecast(self, x_context, t, *, key: Optional[jax.Array] = None):
        """Extrapolate: infer (z0, theta) from a context window and decode
        over an arbitrary (longer) time grid ``t``.

        The decoder's diffeq slot integrates over whatever grid it is
        given, so forecasting is simply encoding on the context and solving
        past it — the latent-DE payoff (the reference exercises this with
        its ``vis_len=60 > seq_len=50`` visualization, model_train.jl:58).
        Returns ``(x_hat, z_hat, l_hat)``.
        """
        out, _, _, _ = self(x_context, t, variational=False, key=key)
        return out


# Convenience alias matching the reference call pattern
def build_model(model_type, encoder_layers, decoder_layers):
    return LatentDiffEqModel.build(model_type, encoder_layers, decoder_layers)
