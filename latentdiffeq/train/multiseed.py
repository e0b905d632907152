"""Population training: S independent seeds in ONE compiled program.

Round-2 finding (benchmarks/RESULTS.md "collapse investigation"): whether
the flagship GOKU run converges to the identifiable solution or collapses
is *RNG-tape luck* — the same config converges on one seed and collapses
on another. The classical fix is to train several seeds and keep the best
validation run, which on the reference costs S× wall-clock (S sequential
CPU runs; the reference has no notion of this — SURVEY.md §2.5).

On TPU it is cheap: the per-seed training step at batch 64 is
latency-bound, not FLOPs-bound (benchmarks/RESULTS.md MFU table — 0.97 %
MFU), so stacking S model replicas on a leading axis via `jax.vmap` over
the SAME fused epoch-block program (trainer.make_block_fn) fills the idle
chip (8 seeds cost 5x one run, not 8x). Each replica gets its own init,
minibatch shuffle, window/reparam tape, and on-device best-(weights,
opt_state) tracking — the same math as S separate `Trainer` runs, equal
to f32 rounding (vmap batches the matmuls, changing reduction order;
tests/test_multiseed.py pins rtol 2e-4 over a multi-block fit).
`best_model` returns the argmin-validation replica.

Long-horizon caveat: over thousands of epochs the f32 rounding
difference is amplified by the annealed ELBO landscape, so replica
``s`` and a solo ``Trainer`` run of seed ``s`` decorrelate into
different (equally valid) draws from the same training distribution
(measured: benchmarks/RESULTS.md, spendulum reproducibility note).
Population training is a selection procedure over tapes, not a replay
of specific solo runs.

Population parallelism: pass ``mesh`` to shard the SEED axis over a
`jax.sharding.Mesh` — the axis is embarrassingly parallel, so each
device slice trains its own replicas with zero collectives until the
final argmin; perfect scaling by construction (one seed per device =
single-seed cost per device).

No reference twin: this is a TPU-native capability the reference cannot
express; it operationalizes the seed sweep that model_train.jl users run
by hand (seed field at model_train.jl:40).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import optim
from .annealing import frange_cycle_linear
from .checkpoint import load_checkpoint, save_checkpoint
from .losses import loss_batch
from .trainer import (TrainConfig, _EPOCH_STREAM, _epoch_keys,
                      make_block_fn)

__all__ = ["MultiSeedTrainer"]


class MultiSeedTrainer:
    """Train one architecture under ``seeds`` independent RNG tapes at once.

    ``model_init_fn(key) -> model`` builds the model pytree from a PRNG
    key (e.g. ``lambda k: LatentDiffEqModel.build(mt, *default_layers(k,
    mt, input_dim, diffeq))``); it is vmapped over the seed axis, so every
    array leaf of ``self.models`` carries a leading seed dimension.

    Per-seed state mirrors `Trainer`'s block path: seed ``s`` gets
    ``np.random.default_rng(s)`` for minibatch shuffles and
    ``jax.random.PRNGKey(s)`` for the window/reparam tape, so seed ``s``
    here trains like ``Trainer(model_init_fn(PRNGKey(s)), replace(cfg,
    seed=s))`` with ``epochs_per_dispatch > 1`` (the fused-block path;
    with ``epochs_per_dispatch=1`` Trainer takes its per-epoch path whose
    val-loss RNG stream differs — identical for deterministic dynamics,
    where the val forward ignores the key, but not for SDEs).

    Progressive curricula change ``seq_len`` (a shape) mid-run; supported
    the same way `Trainer.fit` block mode supports them — blocks break at
    curriculum boundaries.
    """

    def __init__(self, model_init_fn: Callable, cfg: TrainConfig,
                 seeds: Sequence[int],
                 optimizer: Optional[optim.Optimizer] = None,
                 loss_fn: Callable = loss_batch, mesh=None,
                 axis_name: str = "data"):
        if len(seeds) < 1:
            raise ValueError("need at least one seed")
        if not (cfg.jit_epoch and cfg.epochs_per_dispatch >= 1):
            raise ValueError("MultiSeedTrainer requires jit_epoch=True "
                             "(it IS the fused block program)")
        if mesh is not None and len(seeds) % mesh.size != 0:
            raise ValueError(
                f"population parallelism shards the SEED axis: {len(seeds)}"
                f" seeds not divisible by mesh size {mesh.size}")
        self.cfg = cfg
        self.mesh = mesh
        self.axis_name = axis_name
        self.seeds = [int(s) for s in seeds]
        init_keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        self.models = self._shard_seeds(jax.vmap(model_init_fn)(init_keys))
        self.opt = optimizer if optimizer is not None else optim.adamw(
            cfg.lr, 0.9, 0.999, cfg.decay)
        self.opt_states = jax.vmap(self.opt.init)(self.models)
        self.loss_fn = loss_fn
        self.np_rngs = [np.random.default_rng(s) for s in self.seeds]
        self.keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        self.epoch = 0
        self._best = None  # stacked {"model","opt_state","val","epoch"}
        self._block_cache = {}
        self.history = []  # per-epoch dicts with per-seed arrays

    @property
    def n_seeds(self) -> int:
        return len(self.seeds)

    # ------------------------------------------------------------------
    # population parallelism: the seed axis is embarrassingly parallel —
    # sharding the leading (seed) dimension of every replica tree over the
    # mesh places each replica's whole training run on its own device
    # slice; GSPMD needs NO collectives until the host-side argmin.
    # ------------------------------------------------------------------
    def _shard_seeds(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(
            tree, NamedSharding(self.mesh, PartitionSpec(self.axis_name)))

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(tree,
                              NamedSharding(self.mesh, PartitionSpec()))

    # ------------------------------------------------------------------
    def _vmapped_block(self, seq_len: int, steps: int, val_len: int,
                       masked: bool = False):
        key = (seq_len, steps, val_len, masked)
        if key not in self._block_cache:
            raw = make_block_fn(self.cfg, self.opt, self.loss_fn,
                                seq_len, steps, val_len, masked=masked)
            # models/opt/best/idx/keys/betas carry the seed axis; the
            # dataset, val set, epoch ids, and (masked mode) curriculum
            # lengths are shared (broadcast)
            in_axes = (0, 0, 0, None, None, 0, 0, None, None)
            if masked:
                in_axes += (None,)
            self._block_cache[key] = jax.jit(jax.vmap(raw, in_axes=in_axes))
        return self._block_cache[key]

    def fit(self, train_set, val_set, *, epochs: Optional[int] = None,
            verbose: bool = True, callbacks=()):
        """Train all seeds; returns the per-epoch history (per-seed arrays).

        Data handling matches `Trainer.fit`: (samples, time, features)
        arrays, partial minibatches dropped, full-sequence val loss after
        every minibatch.
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        schedule = frange_cycle_linear(cfg.epochs, cfg.start_beta,
                                       cfg.end_beta, cfg.n_cycle, cfg.ratio)
        from .trainer import _prog_seq_lengths
        prog = _prog_seq_lengths(cfg)

        if cfg.autosize_adaptive and self.epoch == 0:
            self.autosize_adaptive_budget(train_set, verbose=verbose)

        data = self._replicate(jnp.asarray(train_set))
        val = self._replicate(jnp.asarray(val_set))
        n = data.shape[0]
        T = int(data.shape[1])
        if cfg.seq_len > T:
            raise ValueError(
                f"cfg.seq_len={cfg.seq_len} exceeds the data's sequence "
                f"length T={T}; set TrainConfig(seq_len<={T})")
        steps = n // cfg.batch_size
        if steps < 1:
            raise ValueError(f"batch_size={cfg.batch_size} exceeds the "
                             f"training set size n={n}")
        S = self.n_seeds

        if self._best is None:
            self._best = self._init_best()

        import time as _time
        masked = cfg.masked_curriculum and cfg.progressive_training
        while self.epoch < epochs:
            ep0 = self.epoch
            seq_len = int(prog[ep0]) if ep0 < len(prog) else cfg.seq_len
            e = ep0
            if masked:
                # one fixed-shape program for the whole ramp (see
                # TrainConfig.masked_curriculum)
                seq_len = cfg.seq_len
                e = min(epochs, ep0 + cfg.epochs_per_dispatch)
                cur_lens = jnp.asarray(
                    [int(prog[i]) if i < len(prog) else cfg.seq_len
                     for i in range(ep0, e)], jnp.int32)
            else:
                while (e < epochs and e - ep0 < cfg.epochs_per_dispatch
                       and (int(prog[e]) if e < len(prog) else cfg.seq_len)
                       == seq_len):
                    e += 1
                cur_lens = None
            E = e - ep0
            betas = jnp.asarray(
                [float(schedule[min(i, len(schedule) - 1)])
                 for i in range(ep0, e)], jnp.float32)
            # per-seed shuffles and epoch-indexed key streams — identical
            # to what each seed's own Trainer.run_block would draw: epoch
            # i's key is a pure function of (seed, i) (trainer._epoch_keys)
            # so blocking/slicing/pruning never shifts any replica's tape
            idx = np.stack([
                np.stack([rng.permutation(n)[:steps * cfg.batch_size]
                          .reshape(steps, cfg.batch_size)
                          for _ in range(E)])
                for rng in self.np_rngs])  # (S, E, steps, batch)
            epoch_ids = jnp.arange(ep0, e, dtype=jnp.int32)
            block_keys = [
                _epoch_keys(jax.random.fold_in(jax.random.PRNGKey(s),
                                               _EPOCH_STREAM), epoch_ids)
                for s in self.seeds]

            block = self._vmapped_block(seq_len, steps, val.shape[1],
                                        masked)
            args = (self.models, self.opt_states, self._best, data, val,
                    self._shard_seeds(jnp.asarray(idx)),
                    self._shard_seeds(jnp.stack(block_keys)), betas,
                    epoch_ids)
            if masked:
                args += (cur_lens,)
            t0 = _time.perf_counter()
            (self.models, self.opt_states, self._best), summaries = block(
                *args)
            jax.block_until_ready(self._best["val"])
            per_ep = (_time.perf_counter() - t0) / E

            # summaries leaves: (S, E)
            s_host = jax.device_get(summaries)
            for i in range(E):
                self.history.append({
                    "epoch": ep0 + i,
                    "seq_len": int(cur_lens[i]) if masked else seq_len,
                    "epoch_s": per_ep, "beta": float(betas[i]),
                    "train_loss": s_host["train_loss"][:, i],
                    "val_loss": s_host["val_loss"][:, i],
                })
            if verbose:
                bv = jax.device_get(self._best["val"])
                j = int(np.argmin(bv))
                print(f"epochs {ep0:4d}-{e - 1:4d}  "
                      f"[{S} seeds]  best val {bv[j]:10.4f} "
                      f"(seed {self.seeds[j]})  "
                      f"{per_ep:7.4f}s/epoch", flush=True)
            self.epoch = e
            # persist the winning replica's best checkpoint after EVERY
            # dispatch, so an interrupted population run still leaves a
            # loadable best_model.npz behind (mirrors Trainer.fit)
            if cfg.save_best:
                import os
                os.makedirs(cfg.checkpoint_dir, exist_ok=True)
                self.save_best(os.path.join(cfg.checkpoint_dir,
                                            "best_model.npz"))
                self.save_population(os.path.join(cfg.checkpoint_dir,
                                                  "population.npz"))
            for cb in callbacks:
                cb(self, self.history[-1])
        return self.history

    def warm_start(self, warm_fn: Callable) -> "MultiSeedTrainer":
        """Apply a warm-start transform to every replica in one vmapped
        program: ``warm_fn(model) -> model`` (e.g. a closure over
        ``train.latent_warm_start`` with domain targets — the pendulum's
        ``pixel_observable.warm_start_pendulum``, Kuramoto's
        ``quality_kuramoto.warm_start``). Must be called before ``fit``
        records any best carry (epoch 0); replicas keep their distinct
        inits as the regression's starting points, so the population
        stays a spread of warm basins rather than one point. Optimizer
        moments are untouched (Adam states are zeros at init). Returns
        self.
        """
        if self.epoch != 0 or self._best is not None:
            raise ValueError("warm_start must run before training starts "
                             "(epoch 0, no best carry)")
        self.models = self._shard_seeds(
            jax.jit(jax.vmap(warm_fn))(self.models))
        return self

    def prune(self, keep) -> "MultiSeedTrainer":
        """Drop replicas mid-run, keeping seed indices ``keep`` (ints into
        the current population). The surviving replicas' tapes, optimizer
        states, best carries, and shuffle streams continue untouched —
        training `keep` onward equals never having trained the dropped
        seeds. With a mesh, the surviving count must still divide it.

        The time-to-quality use: start a wide population, kill collapsed
        tapes once they reveal themselves (val-loss laggards at epoch
        ~500), and spend the remaining wall-clock on survivors only —
        population cost scales with live replicas (RESULTS.md multiseed
        scaling). Returns self.
        """
        keep = sorted(int(i) for i in keep)
        if not keep:
            raise ValueError("must keep at least one replica")
        if any(i < 0 or i >= self.n_seeds for i in keep):
            raise ValueError(f"keep indices {keep} out of range for "
                             f"{self.n_seeds} seeds")
        if self.mesh is not None and len(keep) % self.mesh.size != 0:
            raise ValueError(
                f"{len(keep)} surviving seeds not divisible by mesh size "
                f"{self.mesh.size}")
        idx = jnp.asarray(keep)
        take = lambda t: self._shard_seeds(  # noqa: E731
            jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), t))
        self.models = take(self.models)
        self.opt_states = take(self.opt_states)
        self.keys = jnp.take(self.keys, idx, axis=0)
        if self._best is not None:
            self._best = take(self._best)
        self.seeds = [self.seeds[i] for i in keep]
        self.np_rngs = [self.np_rngs[i] for i in keep]
        self._block_cache = {}  # population width is baked into the jit
        return self

    def autosize_adaptive_budget(self, train_set, *, seq_len=None,
                                 safety=None, floor: int = 16,
                                 verbose: bool = False):
        """Population twin of ``Trainer.autosize_adaptive_budget``
        (TrainConfig.autosize_adaptive): probe the adaptive solve on
        replica 0's weights (one batch, deterministic encode) and shrink
        the shared static step budget across the WHOLE stacked population
        (statics are shared by construction — one program trains all
        replicas)."""
        from .trainer import _autosize_probe, _retree_like, _swap_diffeq
        sized, new_de = _autosize_probe(self.seed_model(0), self.cfg,
                                        train_set, seq_len, safety, floor,
                                        verbose)
        if sized is None:
            return None
        self.models = _swap_diffeq(self.models, new_de)
        opt_shape = jax.eval_shape(jax.vmap(self.opt.init), self.models)
        self.opt_states = _retree_like(self.opt_states, opt_shape)
        if self._best is not None:
            self._best["model"] = _swap_diffeq(self._best["model"], new_de)
            self._best["opt_state"] = _retree_like(
                self._best["opt_state"], opt_shape)
        return sized

    def _init_best(self):
        S = self.n_seeds
        return {
            "model": self.models, "opt_state": self.opt_states,
            "val": self._shard_seeds(jnp.full((S,), jnp.inf, jnp.float32)),
            "epoch": self._shard_seeds(jnp.zeros((S,), jnp.int32)),
        }

    # ------------------------------------------------------------------
    # selection + persistence
    # ------------------------------------------------------------------
    @property
    def best_seed_index(self) -> int:
        # NaN-safe: a replica that never recorded a finite val (diverged
        # from epoch 0) must lose the argmin, not win it
        vals = np.asarray(jax.device_get(self._best["val"]), np.float64)
        vals = np.where(np.isfinite(vals), vals, np.inf)
        return int(np.argmin(vals))

    @property
    def best_seed(self) -> int:
        return self.seeds[self.best_seed_index]

    @property
    def per_seed_best_vals(self):
        """Per-seed best validation losses as floats (+inf for a replica
        that never recorded a finite val). The public view of the
        on-device best carry — record/report from this, not `_best`."""
        return [float(v) for v in jax.device_get(self._best["val"])]

    @property
    def best_val_loss(self) -> float:
        return float(jax.device_get(self._best["val"])[self.best_seed_index])

    @property
    def best_model(self):
        """The argmin-validation replica, unstacked to a plain model."""
        i = self.best_seed_index
        return jax.tree_util.tree_map(lambda a: a[i], self._best["model"])

    def seed_model(self, i: int):
        """Live (latest) model of seed index ``i``, unstacked."""
        return jax.tree_util.tree_map(lambda a: a[i], self.models)

    @property
    def stacked_best_models(self):
        """All replicas' best-so-far weights, stacked on the seed axis.

        The public view of the best-model carry for whole-population
        scoring (e.g. one vmapped forward over every replica instead of
        ``n_seeds`` separate jits — selector_probe.population_pixel_scores
        consumes this)."""
        best = self._best if self._best is not None else self._init_best()
        return best["model"]

    def best_seed_model(self, i: int):
        """Best-so-far weights of seed index ``i``, unstacked."""
        return jax.tree_util.tree_map(lambda a: a[i],
                                      self.stacked_best_models)

    def select(self, score_fn: Callable, *, include_best: bool = True):
        """Population winner by a user score function (higher = better).

        The generic form of the measured domain-observable protocol
        (benchmarks/RESULTS.md round-3 time-to-gate: scoring every
        replica's best-carry AND live weights by an observable computed
        from the data alone and shipping the argmax reaches flagship
        quality 4.7x faster than best-val selection, which is measured
        blind to chart identifiability; see
        examples/pendulum/pixel_observable.py for the measured scorer).

        ``score_fn(models_stacked) -> (n_seeds,)`` array-like, called on
        the live population and (``include_best``) on the best-carry
        population — one whole-population call each, so a vmapped scorer
        pays one compile total. Non-finite scores lose. Returns
        ``(model, info)``: the argmax replica unstacked (best-carry or
        live weights, whichever scored higher) and a dict with
        ``index/seed/score/from_best`` plus both score vectors.

        reference: the role of the user's visual model inspection at
        model_train.jl:210,244-290, made quantitative.
        """
        sl = np.asarray(score_fn(self.models), np.float64)
        if sl.shape != (self.n_seeds,):
            raise ValueError(f"score_fn returned shape {sl.shape}, "
                             f"expected ({self.n_seeds},)")
        sl = np.where(np.isfinite(sl), sl, -np.inf)
        sb = None
        if include_best:
            sb = np.asarray(score_fn(self.stacked_best_models), np.float64)
            sb = np.where(np.isfinite(sb), sb, -np.inf)
        overall = sl if sb is None else np.maximum(sl, sb)
        i = int(np.argmax(overall))
        from_best = bool(sb is not None and sb[i] >= sl[i])
        model = self.best_seed_model(i) if from_best else self.seed_model(i)
        info = {"index": i, "seed": self.seeds[i],
                "score": float(overall[i]), "from_best": from_best,
                "scores_live": sl.tolist(),
                "scores_best": None if sb is None else sb.tolist()}
        return model, info

    def elbo_rank(self, val_set, t, *, beta: float = 1.0, key=None,
                  loss_fn: Callable = loss_batch):
        """Per-seed validation ELBO of the LIVE models at the given beta
        (default 1 — the actual variational objective). Returns a list of
        floats aligned with ``self.seeds``.

        Selection rationale (benchmarks/RESULTS.md round-3 SDE notes):
        the best-val carry tracks the loss at the CURRENT epoch's beta, so
        beta=0 phases rank pure reconstruction — which favors recon-warped
        latent charts over identifiable ones. The beta=1 ELBO separates
        them: identifiable posteriors are prior-compatible (small KL).
        Use ``seeds[argmin(elbo_rank(...))]`` for model selection on
        workloads where recon and identifiability decouple (measured: the
        stochastic pendulum)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        xv = jnp.asarray(val_set)
        t = jnp.asarray(t)

        @jax.jit
        def one(m):
            loss, _ = loss_fn(m, xv, t, jnp.asarray(beta, jnp.float32),
                              variational=True, key=key)
            return loss

        return [float(one(self.seed_model(i))) for i in range(self.n_seeds)]

    def save_best(self, path: str):
        """Checkpoint the winning replica's best (weights, opt_state) as a
        `Trainer`-compatible checkpoint (loadable via Trainer.restore).

        Called automatically after every dispatch when cfg.save_best, so
        an interrupted population run leaves the current winner behind.
        This is salvage/inference state, not full population resume:
        restoring it into a `Trainer` continues the WINNER's training
        single-seed; the other replicas' tapes are not persisted.
        """
        i = self.best_seed_index
        take = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: a[i], t)
        best = jax.device_get({"model": take(self._best["model"]),
                               "opt_state": take(self._best["opt_state"])})
        save_checkpoint(
            path, {"model": best["model"], "opt_state": best["opt_state"],
                   "key": self.keys[i]},
            meta={"epoch": int(jax.device_get(self._best["epoch"])[i]) + 1,
                  "best_val_loss": self.best_val_loss,
                  "np_rng": self.np_rngs[i].bit_generator.state,
                  "seed": self.seeds[i]})

    def save_replica(self, path: str, i: int, *, from_best: bool = True):
        """Checkpoint replica ``i`` as a Trainer-compatible checkpoint
        (loadable via Trainer.restore), with either its best-carry or its
        live (weights, opt_state) — the save half of ``select()``, which
        may pick a live replica that best-val never carried. Restoring it
        into a ``Trainer`` continues that replica's training."""
        take = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: a[i], t)
        src = (self._best if self._best is not None
               else self._init_best()) if from_best else None
        state = jax.device_get({
            "model": take(src["model"]) if from_best
            else take(self.models),
            "opt_state": take(src["opt_state"]) if from_best
            else take(self.opt_states)})
        epoch = (int(jax.device_get(src["epoch"])[i]) + 1
                 if from_best else self.epoch)
        save_checkpoint(
            path, {"model": state["model"], "opt_state": state["opt_state"],
                   "key": self.keys[i]},
            meta={"epoch": epoch, "seed": self.seeds[i],
                  "from_best": from_best,
                  "best_val_loss": float(self.per_seed_best_vals[i])
                  if self._best is not None else float("inf"),
                  "np_rng": self.np_rngs[i].bit_generator.state})

    def save_population(self, path: str):
        """Checkpoint the FULL population: all replicas' live (model,
        opt_state), the stacked best carry, the per-seed jax key chain, and
        the per-seed numpy shuffle states — everything `restore` needs to
        continue an interrupted run bit-for-bit (the resume hole save_best
        leaves: only the winner survives it).

        Written automatically after every dispatch when cfg.save_best
        (alongside best_model.npz) as ``population.npz``.
        """
        state = {"models": self.models, "opt_states": self.opt_states,
                 "keys": self.keys,
                 "best": self._best if self._best is not None
                 else self._init_best()}
        save_checkpoint(
            path, jax.device_get(state),
            meta={"epoch": self.epoch, "seeds": self.seeds,
                  "np_rng_states": [r.bit_generator.state
                                    for r in self.np_rngs]})

    def restore(self, path: str) -> "MultiSeedTrainer":
        """Resume an interrupted population run from `save_population`
        state. The trainer must be constructed with the SAME seeds/config;
        continuing `fit` then reproduces the uninterrupted run (same
        shuffles, same key chains, same best carry). Returns self."""
        template = {"models": self.models, "opt_states": self.opt_states,
                    "keys": self.keys,
                    "best": self._best if self._best is not None
                    else self._init_best()}
        tree, meta = load_checkpoint(path, template)
        if list(meta["seeds"]) != list(self.seeds):
            raise ValueError(
                f"population checkpoint was trained with seeds "
                f"{meta['seeds']}, this trainer has {self.seeds}")
        self.models = self._shard_seeds(tree["models"])
        self.opt_states = self._shard_seeds(tree["opt_states"])
        self.keys = tree["keys"]
        self._best = self._shard_seeds(tree["best"])
        self.epoch = int(meta["epoch"])
        for rng, st in zip(self.np_rngs, meta["np_rng_states"]):
            rng.bit_generator.state = st
        return self
