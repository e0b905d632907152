"""GOKU on the original GOKU-net paper pendulum dataset.

Rebuilds the reference's third training script
(examples/pendulum_friction-less/model_train_original_data.jl): trains on
the dataset from the GOKU-net paper (Linial et al. 2020), min-max
normalized, with a small FIXED beta = 1e-5 (no annealing,
model_train_original_data.jl:44-45), plain ADAM, 900 epochs, seed 3.

The reference downloads ``processed_data.jld2`` from figshare
(https://figshare.com/ndownloader/files/32334561); this container has no
network egress, so pass the converted file locally:

    python train_original_data.py --data /path/to/processed_data.npz

Expected npz contents: ``train_data`` of shape (n, T, 28, 28) or
(n, T, 784) float frames.
"""
import argparse
import os
import sys

import jax
import numpy as np

from latentdiffeq.models import GOKUBasic, LatentDiffEqModel, default_layers
from latentdiffeq.train import (TrainConfig, Trainer, adam,
                                normalize_to_unit_segment, splitobs)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pendulum import Pendulum  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="npz with train_data (n, T, 28*28)")
    ap.add_argument("--epochs", type=int, default=900)
    ap.add_argument("--beta", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    with np.load(args.data) as d:
        x = d["train_data"].astype(np.float32)
    if x.ndim == 4:
        x = x.reshape(x.shape[0], x.shape[1], -1)

    # min-max normalize (model_train_original_data.jl:89)
    x, lo, hi = normalize_to_unit_segment(x)
    train_set, val_set = splitobs(x, 0.9)

    from latentdiffeq import make_options
    diffeq = Pendulum(options=make_options(adaptive=False, substeps=1))
    enc, dec = default_layers(jax.random.PRNGKey(args.seed), GOKUBasic(),
                              x.shape[-1], diffeq)
    model = LatentDiffEqModel.build(GOKUBasic(), enc, dec)

    # fixed tiny beta: start == end == beta, single flat "cycle"
    cfg = TrainConfig(lr=args.lr, epochs=args.epochs, seed=args.seed,
                      seq_len=min(args.seq_len, x.shape[1]),
                      batch_size=args.batch_size,
                      start_beta=args.beta, end_beta=args.beta, n_cycle=1,
                      ratio=0.5,
                      checkpoint_dir=os.path.join(
                          os.path.dirname(os.path.abspath(__file__)),
                          "output_original"))
    trainer = Trainer(model, cfg, optimizer=adam(args.lr))
    trainer.fit(train_set, val_set)


if __name__ == "__main__":
    main()
