from .losses import kl, vector_kl, vector_mse, reconstruction_loss, loss_batch
from .annealing import frange_cycle_linear
from .data import (normalize_to_unit_segment, denormalize_unit_segment,
                   rand_time, time_loader, sample_window, splitobs,
                   DataLoader)
from .optim import (adam, adamw, adabelief, sgd, apply_updates, Optimizer,
                    clip_by_global_norm, chain)
from .checkpoint import save_checkpoint, load_checkpoint
from .trainer import TrainConfig, Trainer, make_block_fn
from .multiseed import MultiSeedTrainer
from .selectors import (temporal_agreement, observation_forecast_scores,
                        observation_composite_scores, combine_composite)
from .warm_start import latent_warm_start

__all__ = [
    "kl", "vector_kl", "vector_mse", "reconstruction_loss", "loss_batch",
    "frange_cycle_linear",
    "normalize_to_unit_segment", "denormalize_unit_segment",
    "rand_time", "time_loader", "sample_window", "splitobs", "DataLoader",
    "adam", "adamw", "adabelief", "sgd", "apply_updates", "Optimizer",
    "clip_by_global_norm", "chain",
    "save_checkpoint", "load_checkpoint",
    "TrainConfig", "Trainer", "make_block_fn", "MultiSeedTrainer",
    "temporal_agreement", "observation_forecast_scores",
    "observation_composite_scores", "combine_composite",
    "latent_warm_start",
]
