"""The training loop: config + jitted train/val steps + epoch driver.

Rebuilds the reference's ``train()`` (examples/pendulum_friction-less/
model_train.jl:68-219) as a reusable component: ADAMW ELBO training with
cyclical KL annealing, shared random time windows per minibatch, optional
progressive sequence-length curriculum, per-minibatch validation loss,
best-validation checkpointing — plus the pieces the reference lacks: full
resume (optimizer state + epoch + rng), per-phase timers, and RHS-eval
throughput accounting (BASELINE.md metric).

TPU design: the training set lives on device; each step gathers its
minibatch rows and slices the shared random window *inside* jit, so one
compiled program does window -> encode -> solve -> decode -> loss -> grads
-> ADAMW update. Host work per step is a permutation lookup.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from . import optim
from .annealing import frange_cycle_linear
from .checkpoint import load_checkpoint, save_checkpoint
from .data import splitobs
from .losses import loss_batch

__all__ = ["TrainConfig", "Trainer", "make_block_fn"]


@dataclasses.dataclass
class TrainConfig:
    """Mirrors the reference's ``Args`` (model_train.jl:28-62)."""

    lr: float = 1e-3
    decay: float = 1e-3
    batch_size: int = 64
    seq_len: int = 50
    epochs: int = 1500
    seed: int = 333
    dt: float = 0.05
    variational: bool = True

    # KL annealing (model_train.jl:45-49)
    start_beta: float = 0.0
    end_beta: float = 1.0
    n_cycle: int = 4
    ratio: float = 0.9

    # progressive observation training (model_train.jl:53-56)
    progressive_training: bool = False
    prog_training_duration: int = 200
    start_seq_len: int = 10
    # Round curriculum lengths to multiples of this value. Every distinct
    # seq_len compiles a fresh program (true for the reference's Julia JIT
    # as well); rounding caps the number of compiles. None = exact
    # reference curriculum (one length per epoch).
    prog_seq_len_step: Optional[int] = 5
    # Masked single-compile curriculum: keep every shape fixed at
    # ``seq_len`` and thread the curriculum length through the program as
    # a TRACED int32 (`cur_len`) — the window is a wrapped gather, the
    # encoder scans carry an update mask (nn/recurrent.py), and the loss
    # averages over `cur_len` frames (losses.loss_batch). The ENTIRE ramp
    # then runs ONE compiled program instead of one per distinct length
    # (the dominant cost of short time-to-gate runs — each bf16 flagship
    # block compile is ~10-20 s). Identical math to the sliced curriculum
    # at every length; bitwise-equal to the unmasked program at full
    # length (tests/test_masked_curriculum.py). Requires block mode
    # (jit_epoch + epochs_per_dispatch > 1); no-op unless
    # progressive_training. With this on, prog_seq_len_step=1 recovers
    # the reference's exact one-length-per-epoch curriculum at zero
    # compile cost.
    masked_curriculum: bool = False

    # parity knob: the reference computes the full-sequence val loss every
    # minibatch (model_train.jl:204)
    val_every_batch: bool = True
    mask_failures: bool = False
    # KL free bits (per latent dim; Kingma et al. 2016). 0 = the
    # reference's plain KL; ~0.05-0.2 guards against posterior collapse.
    free_bits: float = 0.0

    # Fuse the whole epoch (all minibatch steps + val) into ONE jitted
    # program — a `lax.scan` over minibatches. Removes per-step host
    # dispatch latency from the critical path (significant through the TPU
    # tunnel). Semantics identical to the per-step path.
    jit_epoch: bool = True

    # Fuse BLOCKS of epochs into one dispatch (an outer `lax.scan` over
    # epochs). Best-validation weights are tracked on-device in the scan
    # carry, so the best checkpoint survives without per-epoch host
    # round-trips. 1 => one dispatch per epoch.
    epochs_per_dispatch: int = 25

    checkpoint_dir: str = "output"
    save_best: bool = True

    # Probe-size the adaptive step budget before compiling (the COST NOTE
    # knob automated): at the start of fit(), encode one training batch
    # with the current weights, run the adaptive solve once, read the
    # actual per-trajectory attempt counts, and SHRINK the masked-scan
    # budget to ceil(autosize_safety * max attempts) (never above the
    # configured max_steps — that stays the user's ceiling). The bounded
    # scan pays max_steps iterations per trajectory regardless of
    # difficulty, so a measured budget converts directly into epoch time;
    # an undersized budget stays loud (success=False -> NaN-fill).
    # No-op for fixed-grid dynamics.
    autosize_adaptive: bool = False
    autosize_safety: float = 1.5
    # Quantile budget: size from this per-trajectory attempt quantile
    # instead of the max. The masked scan pays the BUDGET per trajectory
    # regardless of difficulty, so a worst-case (max) budget bills every
    # trajectory for the stiffest one in the probe batch. With q < 1 the
    # tail trajectories that genuinely exceed the budget NaN-fill LOUDLY
    # (success=False, n_failed in metrics) and — required — are masked
    # out of that window's loss (mask_failures=True is enforced; they
    # still train on the windows/epochs where they fit the budget).
    # 1.0 = worst-case sizing (round-4 behavior).
    # MEASURED (round 5, autosize_epoch_cost.json): on the flagship
    # SPendulum/pendulum workloads the attempt distribution is a POINT
    # MASS at n_intervals (one accepted step per save interval, zero
    # rejects — the dt-grid saveat floors the step count), so every
    # quantile equals the max and q < 1 is a no-op; the dead weight there
    # is the multiplicative headroom — shrink `autosize_safety` toward
    # 1.0 (with mask_failures=True) instead. q < 1 only bites when the
    # probe batch has genuinely heterogeneous stiffness across
    # trajectories.
    autosize_quantile: float = 1.0
    # SDE only: headroom (in dyadic doublings) added to the probe's
    # deepest refinement level when autosizing shrinks
    # SDEAdaptiveConfig.depth_cap — the per-step masked vbt_query descent
    # whose length is a static cost every step pays (see _autosize_probe).
    # A trajectory that later refines past the shrunk cap NaN-fills loud.
    autosize_depth_margin: int = 2


# Domain-separation tag for the per-epoch training key stream (see
# `_epoch_keys`): epoch i's key is fold_in(fold_in(PRNGKey(seed), TAG), i)
# — a pure function of (seed, epoch index).
_EPOCH_STREAM = 0x65706F63  # "epoc"


def _epoch_keys(stream_key, epoch_ids):
    """Per-epoch training keys as a pure function of the epoch index.

    Deriving epoch keys by `fold_in(stream, epoch)` — instead of advancing
    a sequential split chain — makes the training RNG stream bitwise
    invariant to how epochs are grouped into dispatches
    (``epochs_per_dispatch``) and to slicing ``fit`` into multiple calls.
    Round 2 measured real quality divergence between dispatch blockings
    (RESULTS.md "block-dispatch investigation"); with this derivation the
    blocking is a pure performance knob (tests/test_rng_invariance.py).
    """
    ids = jnp.asarray(epoch_ids, dtype=jnp.uint32)
    return jax.vmap(lambda e: jax.random.fold_in(stream_key, e))(ids)


def _prog_seq_lengths(cfg: TrainConfig) -> np.ndarray:
    """Progressive curriculum lengths (model_train.jl:142-147)."""
    if not cfg.progressive_training:
        return np.array([], dtype=int)
    r = np.linspace(cfg.start_seq_len, cfg.seq_len,
                    cfg.prog_training_duration)
    lengths = np.round(r).astype(int)
    if cfg.prog_seq_len_step:
        s = cfg.prog_seq_len_step
        lengths = np.minimum(-(-lengths // s) * s, cfg.seq_len)
    return lengths


def _autosize_probe(model, cfg: TrainConfig, train_set, seq_len=None,
                    safety=None, floor: int = 16, verbose: bool = False):
    """Shared core of ``autosize_adaptive_budget`` (Trainer and
    MultiSeedTrainer): probe the adaptive solve on one encoded batch and
    return ``(sized_max_steps, new_dynamics)`` or ``(None, None)``."""
    import math

    from ..models.dynamics import ODEDynamics, SDEDynamics
    from ..solve.adaptive import solve_adaptive
    from ..solve.sde import solve_sde_adaptive

    seq_len = seq_len or cfg.seq_len
    safety = cfg.autosize_safety if safety is None else safety
    de = model.decoder.diffeq
    is_ode = isinstance(de, ODEDynamics) and de.options.adaptive
    is_sde = isinstance(de, SDEDynamics) and de.adaptive
    if not (is_ode or is_sde):
        return None, None
    acfg = de.options.adaptive_cfg if is_ode else de.adaptive_cfg

    x = jnp.asarray(train_set)[:cfg.batch_size, :seq_len]
    t = jnp.arange(seq_len, dtype=jnp.float32) * cfg.dt

    @jax.jit
    def probe(model, x):
        mu, _ = model.encoder(x)
        l_hat = model.model_type.apply_latent_out(model.decoder, mu)
        z0, th = jax.tree_util.tree_map(
            lambda a: jax.lax.stop_gradient(a.astype(jnp.float32)), l_hat)
        if is_ode:
            def one(u0, p):
                _, ok, st = solve_adaptive(de.f, de.solver, u0, p, t, acfg)
                return ok, st["n_accepted"] + st["n_rejected"], 0
            return jax.vmap(one)(z0, th)
        keys = jax.random.split(jax.random.PRNGKey(0), z0.shape[0])

        def one(u0, p, k):
            _, ok, st = solve_sde_adaptive(de.f, de.g, de.solver, u0, p,
                                           t, k, acfg)
            return (ok, st["n_accepted"] + st["n_rejected"],
                    st["max_depth"])
        return jax.vmap(one)(z0, th, keys)

    ok, attempts, depths = jax.device_get(probe(model, x))
    if not ok.all():
        return None, None  # capped probe: no evidence the budget shrinks
    q = float(cfg.autosize_quantile)
    if q < 1.0 and not cfg.mask_failures:
        raise ValueError(
            "autosize_quantile < 1 sizes the step budget BELOW the probe's "
            "worst trajectory, so tail trajectories are expected to "
            "NaN-fill; without mask_failures=True those NaNs poison the "
            "whole batch loss and gradients. Set "
            "TrainConfig(mask_failures=True) (or autosize_quantile=1.0).")
    if not cfg.mask_failures:
        import warnings
        warnings.warn(
            "autosize_adaptive with mask_failures=False: if training later "
            "stiffens the dynamics past the probe-sized budget, solves "
            "NaN-fill and the unmasked loss/gradients go NaN, corrupting "
            "the run. Prefer TrainConfig(mask_failures=True).",
            stacklevel=3)
    target = (int(attempts.max()) if q >= 1.0
              else int(math.ceil(float(np.quantile(attempts, q)))))
    sized = max(floor, int(math.ceil(safety * target)))
    # never EXPAND past the configured effective budget (the user ceiling,
    # including any per-interval cap the scan already compiles with)
    eff = acfg.max_steps
    if is_sde and acfg.max_steps_per_interval:
        eff = min(eff, acfg.max_steps_per_interval * max(seq_len - 1, 1))
    sized = min(sized, eff)
    new_acfg = dataclasses.replace(acfg, max_steps=sized,
                                   **({"max_steps_per_interval": 0}
                                      if is_sde else {}))
    sized_depth = None
    if is_sde:
        # ALSO shrink the dyadic depth cap: vbt_query pays depth_cap
        # masked bridge splits (2 fold_ins + 2 Gaussian draws each) per
        # STEP whether or not the step refines — for small mechanistic
        # states that static descent dominates the step cost (measured:
        # autosize_epoch_cost.json, RESULTS.md round-5). Size it at the
        # probe's deepest refinement + autosize_depth_margin doublings of
        # headroom; a trajectory that later needs to refine past the cap
        # fails LOUD (at_cap -> NaN-fill), same semantics as the step
        # budget.
        sized_depth = min(int(acfg.depth_cap),
                          int(depths.max()) + int(cfg.autosize_depth_margin))
        new_acfg = dataclasses.replace(new_acfg, depth_cap=sized_depth)
    if is_ode:
        new_de = dataclasses.replace(
            de, options=de.options.replace(adaptive_cfg=new_acfg))
    else:
        new_de = dataclasses.replace(de, adaptive_cfg=new_acfg)
    if verbose:
        depth_note = ("" if sized_depth is None else
                      f", depth_cap {int(acfg.depth_cap)} -> {sized_depth} "
                      f"(probe max depth {int(depths.max())})")
        print(f"autosized adaptive budget: max attempts "
              f"{int(attempts.max())} -> max_steps {sized} "
              f"(was {eff}){depth_note}", flush=True)
    return sized, new_de


def _swap_diffeq(model, new_de):
    return dataclasses.replace(
        model, decoder=dataclasses.replace(model.decoder, diffeq=new_de))


def _retree_like(tree, shaped):
    """Transfer ``tree``'s leaves onto ``shaped``'s treedef (same leaf
    count/order; only static metadata differs — e.g. after a diffeq
    budget swap, optimizer moments must carry the model's NEW statics so
    tree_maps against gradients keep matching treedefs)."""
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(shaped),
        jax.tree_util.tree_leaves(tree))


def make_block_fn(cfg: TrainConfig, opt, loss_fn, seq_len: int, steps: int,
                  val_len: int, constrain=None, masked: bool = False):
    """Build the fused multi-epoch training program (UNjitted).

    Returns ``block_fn(model, opt_state, best, data, val_data, idx_blocks,
    keys, betas, epoch_ids) -> ((model, opt_state, best), summaries)`` — an
    outer `lax.scan` over epochs, inner scan over minibatches (window ->
    grads -> ADAMW update -> full val loss), with the best-validation
    (weights, opt_state, epoch) tracked on-device in the carry. Identical
    math to `Trainer`'s per-epoch path (tested: the shared-tape bisect in
    benchmarks/ reproduced per-epoch training digit-for-digit).

    ``masked=True`` (TrainConfig.masked_curriculum): block_fn takes one
    extra trailing argument ``cur_lens`` — (n_epochs,) int32 curriculum
    lengths, TRACED — and every epoch trains on a ``cur_lens[i]``-frame
    window carried in the fixed (batch, seq_len, features) buffer: the
    window start is drawn from [0, full - cur_len), the buffer is filled
    by a wrapped gather, the encoder freezes past the prefix (recurrent
    mask), and the loss averages over ``cur_len`` frames. One compiled
    program serves the whole seq-len ramp.

    Callers wrap it: `Trainer` with `jax.jit`, `MultiSeedTrainer`
    (multiseed.py) with `jax.jit(jax.vmap(...))` to train a population of
    seeds in one program.
    """
    if constrain is None:
        constrain = lambda x: x  # noqa: E731
    t = jnp.arange(seq_len, dtype=jnp.float32) * cfg.dt
    t_val = jnp.arange(val_len, dtype=jnp.float32) * cfg.dt

    def val_metrics_fn(model, val_data, beta, vkey):
        _, m = loss_fn(model, val_data, t_val, beta, variational=False,
                       key=vkey, mask_failures=cfg.mask_failures,
                       free_bits=cfg.free_bits)
        return m

    def step_body(model, opt_state, x, k, beta, cur_len=None):
        kwin, kvar = jax.random.split(k)
        full = x.shape[1]
        if cur_len is None:
            start = jax.random.randint(kwin, (), 0, max(full - seq_len, 1))
            x = jax.lax.dynamic_slice_in_dim(x, start, seq_len, axis=1)
        else:
            # Traced window: start uniform over the cur_len-valid range;
            # the fixed-size buffer is filled by a wrapped gather (frames
            # past cur_len are padding — masked everywhere downstream).
            # At cur_len == seq_len this reproduces the static slice
            # bitwise: same randint draw, no wrap.
            start = jax.random.randint(
                kwin, (), 0, jnp.maximum(full - cur_len, 1))
            x = jnp.take(x, (start + jnp.arange(seq_len)) % full, axis=1)
        x = constrain(x)

        # cur_len is only forwarded in masked mode so custom loss_fns
        # without the kwarg keep working on the unmasked path
        kw = {} if cur_len is None else {"cur_len": cur_len}

        def lf(m):
            return loss_fn(m, x, t, beta, variational=cfg.variational,
                           key=kvar, mask_failures=cfg.mask_failures,
                           free_bits=cfg.free_bits, **kw)

        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(model)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optim.apply_updates(model, updates), opt_state, metrics

    def block_fn(model, opt_state, best, data, val_data,
                 idx_blocks, keys, betas, epoch_ids, cur_lens=None):
        def epoch_body(carry, xs):
            model, opt_state, best = carry
            if masked:
                idx_mat, key, beta, ep_id, cur_len = xs
            else:
                idx_mat, key, beta, ep_id = xs
                cur_len = None
            step_keys = jax.random.split(key, steps)

            def inner(c, sxs):
                m, o = c
                idx, k = sxs
                m, o, metrics = step_body(m, o, data[idx], k, beta,
                                          cur_len)
                vm = (val_metrics_fn(m, val_data, beta,
                                     jax.random.fold_in(k, 7))
                      if cfg.val_every_batch else {})
                return (m, o), (metrics, vm)

            (model, opt_state), (ms, vs) = jax.lax.scan(
                inner, (model, opt_state), (idx_mat, step_keys))
            if cfg.val_every_batch:
                vm = jax.tree_util.tree_map(lambda a: a[-1], vs)
            else:
                vm = val_metrics_fn(model, val_data, beta,
                                    jax.random.fold_in(key, 11))
            # Track the best (weights, opt_state, epoch) TOGETHER in the
            # carry so block-mode checkpoints are self-consistent (Adam
            # moments match the saved weights; ADVICE round 1).
            # NaN-safe: a diverged epoch's NaN val loss compares False, so
            # the carry keeps the last REAL best (jnp.minimum would
            # propagate the NaN and freeze best tracking forever — and
            # poison MultiSeedTrainer's argmin winner selection).
            improved = vm["loss"] < best["val"]
            sel = jax.tree_util.tree_map
            best = {
                "model": sel(lambda a, b: jnp.where(improved, a, b),
                             model, best["model"]),
                "opt_state": sel(lambda a, b: jnp.where(improved, a, b),
                                 opt_state, best["opt_state"]),
                "val": jnp.where(improved, vm["loss"], best["val"]),
                "epoch": jnp.where(improved, ep_id, best["epoch"]),
            }
            ep_summary = {
                "train_loss": jnp.mean(ms["loss"]),
                "val_loss": vm["loss"],
                "rhs_evals": jnp.sum(ms["n_rhs_evals"]),
                "n_failed": jnp.sum(ms["n_failed"]),
                "beta": beta,
                "kl": jnp.mean(ms["kl"]),
            }
            return (model, opt_state, best), ep_summary

        xs = ((idx_blocks, keys, betas, epoch_ids, cur_lens) if masked
              else (idx_blocks, keys, betas, epoch_ids))
        carry, summaries = jax.lax.scan(
            epoch_body, (model, opt_state, best), xs)
        return carry, summaries

    return block_fn


class Trainer:
    """Single-chip AND data-parallel training driver.

    Pass ``mesh`` (a 1-D `jax.sharding.Mesh`) to train data-parallel: the
    SAME jitted epoch/block programs run with the minibatch constrained to
    the mesh's data axis — parameters stay replicated and XLA inserts the
    gradient all-reduce over ICI where the loss reductions cross the batch
    axis (GSPMD; see parallel/data_parallel.py for the explicit shard_map
    twin it is tested against). Semantics (windows, permutations, betas,
    best tracking, checkpoints) are identical to the single-chip path.
    """

    def __init__(self, model, cfg: TrainConfig,
                 optimizer: Optional[optim.Optimizer] = None,
                 loss_fn: Callable = loss_batch,
                 mesh: Optional[Mesh] = None, axis_name: str = "data"):
        self.mesh = mesh
        self.axis_name = axis_name
        if mesh is not None and cfg.batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size "
                f"{mesh.size}")
        self.cfg = cfg
        self.model = model if mesh is None else jax.device_put(
            model, NamedSharding(mesh, PartitionSpec()))
        self.opt = optimizer if optimizer is not None else optim.adamw(
            cfg.lr, 0.9, 0.999, cfg.decay)
        self.opt_state = self.opt.init(self.model)
        self.loss_fn = loss_fn
        self.epoch = 0
        self.best_val_loss = float("inf")
        self.np_rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        # Epoch-indexed training key stream (see `_epoch_keys`): training
        # randomness is a pure function of (seed, epoch), NOT of how
        # epochs are blocked into dispatches or fit() calls.
        self._epoch_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                             _EPOCH_STREAM)
        self._step_cache = {}
        self._val_cache = {}
        self._epoch_cache = {}
        # Block-mode best checkpoint, tracked ON DEVICE in the scan carry:
        # {"model", "opt_state", "val", "epoch"} — kept consistent as a unit.
        self._best_dev = None
        self.history = []

    # ------------------------------------------------------------------
    # data-parallel plumbing (no-ops without a mesh)
    # ------------------------------------------------------------------
    def _constrain_batch(self, x):
        """Pin a minibatch's sample axis to the mesh's data axis — the one
        annotation GSPMD needs to shard the whole fwd/bwd and place the
        gradient all-reduce."""
        if self.mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec(self.axis_name)))

    def _put_replicated(self, tree):
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return jax.device_put(tree, NamedSharding(self.mesh,
                                                  PartitionSpec()))

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _make_train_step(self, seq_len: int):
        cfg, opt, loss_fn = self.cfg, self.opt, self.loss_fn
        t = jnp.arange(seq_len, dtype=jnp.float32) * cfg.dt

        @jax.jit
        def step(model, opt_state, data, batch_idx, key, beta):
            kwin, kvar = jax.random.split(key)
            x = data[batch_idx]  # gather minibatch rows on-device
            full = x.shape[1]
            start = jax.random.randint(kwin, (), 0, max(full - seq_len, 1))
            x = jax.lax.dynamic_slice_in_dim(x, start, seq_len, axis=1)
            x = self._constrain_batch(x)

            def lf(m):
                return loss_fn(m, x, t, beta, variational=cfg.variational,
                               key=kvar, mask_failures=cfg.mask_failures,
                               free_bits=cfg.free_bits)

            (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
                model)
            updates, opt_state = opt.update(grads, opt_state, model)
            model = optim.apply_updates(model, updates)
            return model, opt_state, metrics

        return step

    def _make_val_step(self, val_len: int):
        cfg, loss_fn = self.cfg, self.loss_fn
        t_val = jnp.arange(val_len, dtype=jnp.float32) * cfg.dt

        @jax.jit
        def vstep(model, val_data, beta, vkey):
            # full-sequence, non-variational (model_train.jl:204)
            loss, metrics = loss_fn(model, val_data, t_val, beta,
                                    variational=False, key=vkey,
                                    mask_failures=cfg.mask_failures,
                                    free_bits=cfg.free_bits)
            return metrics

        return vstep

    def _make_epoch_fn(self, seq_len: int, steps: int, val_len: int):
        """One jitted program for a full epoch: `lax.scan` over minibatch
        steps (window -> grads -> update), each followed by the full val
        loss when ``val_every_batch`` (the reference's exact loop shape,
        model_train.jl:186-207, minus the host round-trips)."""
        cfg, opt, loss_fn = self.cfg, self.opt, self.loss_fn
        t = jnp.arange(seq_len, dtype=jnp.float32) * cfg.dt
        t_val = jnp.arange(val_len, dtype=jnp.float32) * cfg.dt

        def val_metrics_fn(model, val_data, beta, vkey):
            # key threads through for stochastic (SDE) dynamics; the
            # forward stays non-variational (model_train.jl:204)
            _, m = loss_fn(model, val_data, t_val, beta, variational=False,
                           key=vkey, mask_failures=cfg.mask_failures,
                           free_bits=cfg.free_bits)
            return m

        @jax.jit
        def epoch_fn(model, opt_state, data, val_data, idx_mat, key, beta):
            keys = jax.random.split(key, steps)

            def body(carry, xs):
                model, opt_state = carry
                idx, k = xs
                # Same per-step key structure as make_block_fn.step_body
                # (2-way split + fold_in(k, 7) for the per-batch val), so
                # the per-epoch path is bitwise the dispatch-N block path.
                kwin, kvar = jax.random.split(k)
                kval = jax.random.fold_in(k, 7)
                x = data[idx]
                full = x.shape[1]
                start = jax.random.randint(kwin, (), 0, max(full - seq_len, 1))
                x = jax.lax.dynamic_slice_in_dim(x, start, seq_len, axis=1)
                x = self._constrain_batch(x)

                def lf(m):
                    return loss_fn(m, x, t, beta,
                                   variational=cfg.variational, key=kvar,
                                   mask_failures=cfg.mask_failures,
                                   free_bits=cfg.free_bits)

                (_, metrics), grads = jax.value_and_grad(
                    lf, has_aux=True)(model)
                updates, opt_state = opt.update(grads, opt_state, model)
                model = optim.apply_updates(model, updates)
                if cfg.val_every_batch:
                    vm = val_metrics_fn(model, val_data, beta, kval)
                else:
                    vm = {}
                return (model, opt_state), (metrics, vm)

            (model, opt_state), (ms, vs) = jax.lax.scan(
                body, (model, opt_state), (idx_mat, keys))
            if cfg.val_every_batch:
                val_m = jax.tree_util.tree_map(lambda a: a[-1], vs)
            else:
                val_m = val_metrics_fn(model, val_data, beta,
                                       jax.random.fold_in(key, 11))
            return model, opt_state, ms, val_m

        return epoch_fn

    def _make_block_fn(self, seq_len: int, steps: int, val_len: int,
                       n_epochs: int, masked: bool = False):
        """One jitted program for ``n_epochs`` epochs (see
        `make_block_fn`), with minibatches constrained to this trainer's
        mesh."""
        return jax.jit(make_block_fn(self.cfg, self.opt, self.loss_fn,
                                     seq_len, steps, val_len,
                                     constrain=self._constrain_batch,
                                     masked=masked))

    def run_block(self, data, val_data, betas, seq_len=None, cur_lens=None):
        """Run len(betas) epochs in one dispatch. Returns per-epoch summary
        arrays. ``cur_lens`` (masked-curriculum mode): per-epoch traced
        curriculum lengths; the program is compiled once for any values."""
        cfg = self.cfg
        seq_len = seq_len or cfg.seq_len
        masked = cur_lens is not None
        n = data.shape[0]
        steps = n // cfg.batch_size
        E = len(betas)
        cache_key = ("block", seq_len, steps, val_data.shape[1], E, masked)
        if cache_key not in self._epoch_cache:
            self._epoch_cache[cache_key] = self._make_block_fn(
                seq_len, steps, val_data.shape[1], E, masked)
        idx = np.stack([
            self.np_rng.permutation(n)[:steps * cfg.batch_size]
            .reshape(steps, cfg.batch_size) for _ in range(E)])
        if self._best_dev is None:
            self._best_dev = {"model": self.model,
                              "opt_state": self.opt_state,
                              "val": jnp.float32(self.best_val_loss),
                              "epoch": jnp.asarray(self.epoch, jnp.int32)}
        epoch_ids = jnp.arange(self.epoch, self.epoch + E, dtype=jnp.int32)
        keys = _epoch_keys(self._epoch_key, epoch_ids)
        args = (self.model, self.opt_state, self._best_dev, data, val_data,
                jnp.asarray(idx), keys, jnp.asarray(betas, jnp.float32),
                epoch_ids)
        if masked:
            args += (jnp.asarray(cur_lens, jnp.int32),)
        (self.model, self.opt_state, self._best_dev), summaries = \
            self._epoch_cache[cache_key](*args)
        return summaries

    def run_epoch(self, data, val_data, beta, seq_len=None):
        """Run one fused epoch; returns (train_metrics_stacked, val_metrics)."""
        cfg = self.cfg
        seq_len = seq_len or cfg.seq_len
        n = data.shape[0]
        steps = n // cfg.batch_size
        cache_key = (seq_len, steps, val_data.shape[1])
        if cache_key not in self._epoch_cache:
            self._epoch_cache[cache_key] = self._make_epoch_fn(*cache_key)
        perm = self.np_rng.permutation(n)
        idx_mat = jnp.asarray(
            perm[:steps * cfg.batch_size].reshape(steps, cfg.batch_size))
        k = jax.random.fold_in(self._epoch_key, jnp.uint32(self.epoch))
        self.model, self.opt_state, ms, vm = self._epoch_cache[cache_key](
            self.model, self.opt_state, data, val_data, idx_mat, k,
            jnp.float32(beta))
        return ms, vm

    def train_step(self, data, batch_idx, beta, seq_len=None):
        seq_len = seq_len or self.cfg.seq_len
        if seq_len not in self._step_cache:
            self._step_cache[seq_len] = self._make_train_step(seq_len)
        self.key, k = jax.random.split(self.key)
        self.model, self.opt_state, metrics = self._step_cache[seq_len](
            self.model, self.opt_state, data, batch_idx, k,
            jnp.float32(beta))
        return metrics

    def val_step(self, val_data, beta):
        val_len = val_data.shape[1]
        if val_len not in self._val_cache:
            self._val_cache[val_len] = self._make_val_step(val_len)
        self.key, vk = jax.random.split(self.key)
        return self._val_cache[val_len](self.model, val_data,
                                        jnp.float32(beta), vk)

    def autosize_adaptive_budget(self, train_set, *, seq_len=None,
                                 safety: Optional[float] = None,
                                 floor: int = 16,
                                 verbose: bool = False) -> Optional[int]:
        """Probe-size the adaptive step budget from the data (see
        TrainConfig.autosize_adaptive; the training-path automation of
        ``solve.autosize_max_steps``).

        Encodes the first training batch with the CURRENT weights
        (deterministic mu path, no gradients), applies latent_out, runs
        the adaptive solve once per trajectory, and shrinks the dynamics'
        ``max_steps`` to ``clip(ceil(safety * max attempts), floor,
        configured max_steps)``. The budget is static metadata, so the
        model pytree is rebuilt (jit retraces automatically — call BEFORE
        the expensive block compiles, which fit() does). No-op (returns
        None) for fixed-grid or neural dynamics, or when the probe itself
        exhausts the budget (no evidence it can shrink).

        reference: per-trajectory cost semantics of GOKU.jl:121 — the
        reference's solves are difficulty-bound by construction; the
        bounded-scan TPU design pays the budget instead, so the budget
        must be measured, not defaulted.
        """
        sized, new_de = _autosize_probe(self.model, self.cfg, train_set,
                                        seq_len, safety, floor, verbose)
        if sized is None:
            return None
        self.model = _swap_diffeq(self.model, new_de)
        # opt-state moments are model-shaped subtrees: transfer their
        # leaves onto the new statics so tree_maps against grads keep
        # matching treedefs (the swap changes metadata only, never leaves)
        self.opt_state = _retree_like(
            self.opt_state, jax.eval_shape(self.opt.init, self.model))
        if getattr(self, "_best_dev", None) is not None:
            self._best_dev["model"] = _swap_diffeq(
                self._best_dev["model"], new_de)
            self._best_dev["opt_state"] = _retree_like(
                self._best_dev["opt_state"],
                jax.eval_shape(self.opt.init, self.model))
        return sized

    # ------------------------------------------------------------------
    # epoch driver
    # ------------------------------------------------------------------
    def fit(self, train_set, val_set, *, epochs: Optional[int] = None,
            log_every: int = 1, callbacks=(), verbose: bool = True):
        """Run the training loop.

        ``train_set``/``val_set``: (samples, time, features) arrays (the 90/10
        split of model_train.jl:115-117 — use `data.splitobs`).
        """
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        schedule = frange_cycle_linear(cfg.epochs, cfg.start_beta,
                                       cfg.end_beta, cfg.n_cycle, cfg.ratio)
        prog = _prog_seq_lengths(cfg)

        # With a mesh, the dataset is stored replicated and each minibatch
        # is constrained onto the data axis inside the step (the dataset is
        # small; the compute is what gets sharded). val stays replicated so
        # the full-val loss keeps exact reference semantics at any mesh
        # size (45 rows need not divide the device count).
        T = int(jnp.asarray(train_set).shape[1])
        if cfg.seq_len > T:
            raise ValueError(
                f"cfg.seq_len={cfg.seq_len} exceeds the data's sequence "
                f"length T={T}; set TrainConfig(seq_len<={T}) (the "
                "reference trains on windows of the full sequence, "
                "model_train.jl:192)")
        if cfg.autosize_adaptive and self.epoch == 0:
            self.autosize_adaptive_budget(train_set, verbose=verbose)
        data = self._put_replicated(jnp.asarray(train_set))
        val = self._put_replicated(jnp.asarray(val_set))
        n = data.shape[0]
        steps_per_epoch = n // cfg.batch_size
        if steps_per_epoch < 1:
            raise ValueError(
                f"batch_size={cfg.batch_size} exceeds the training set "
                f"size n={n}, so an epoch has zero minibatches (partial "
                "batches are dropped, reference DataLoader partial=false, "
                f"model_train.jl:120); set TrainConfig(batch_size<={n})")

        # Block mode: scan whole groups of epochs in one dispatch.
        # Callbacks (e.g. visualization) fire once per block on the last
        # record; set epochs_per_dispatch=1 for the reference's strictly
        # per-epoch cadence.
        use_blocks = cfg.jit_epoch and cfg.epochs_per_dispatch > 1
        masked = cfg.masked_curriculum and cfg.progressive_training
        if cfg.masked_curriculum and not use_blocks:
            raise ValueError(
                "masked_curriculum requires block mode (jit_epoch=True, "
                "epochs_per_dispatch > 1) — it is a property of the fused "
                "block program")
        while use_blocks and self.epoch < epochs:
            ep0 = self.epoch
            seq_len = int(prog[ep0]) if ep0 < len(prog) else cfg.seq_len
            e = ep0
            if masked:
                # one fixed-shape program; the curriculum length rides in
                # the epoch scan as data, so blocks never break for it
                seq_len = cfg.seq_len
                e = min(epochs, ep0 + cfg.epochs_per_dispatch)
                cur_lens = [int(prog[i]) if i < len(prog) else cfg.seq_len
                            for i in range(ep0, e)]
            else:
                # extend the block while seq_len stays constant
                while (e < epochs and e - ep0 < cfg.epochs_per_dispatch
                       and (int(prog[e]) if e < len(prog) else cfg.seq_len)
                       == seq_len):
                    e += 1
                cur_lens = None
            betas = [float(schedule[min(i, len(schedule) - 1)])
                     for i in range(ep0, e)]
            t0 = time.perf_counter()
            summaries = self.run_block(data, val, betas, seq_len, cur_lens)
            last_val = float(summaries["val_loss"][-1])  # blocks
            wall = time.perf_counter() - t0
            per_ep = wall / len(betas)
            for i in range(len(betas)):
                rec = {"epoch": ep0 + i,
                       "train_loss": float(summaries["train_loss"][i]),
                       "val_loss": float(summaries["val_loss"][i]),
                       "beta": betas[i],
                       "seq_len": cur_lens[i] if masked else seq_len,
                       "epoch_s": per_ep,
                       "rhs_evals_per_s":
                           float(summaries["rhs_evals"][i]) / per_ep}
                self.history.append(rec)
            prev_best = self.best_val_loss
            self.best_val_loss = float(self._best_dev["val"])
            if verbose:
                r = self.history[-1]
                print(f"epochs {ep0:4d}-{e - 1:4d}  "
                      f"loss {r['train_loss']:10.4f}  "
                      f"val {r['val_loss']:10.4f}  best "
                      f"{self.best_val_loss:10.4f}  "
                      f"{per_ep:7.4f}s/epoch", flush=True)
            self.epoch = e
            # Persist the block's best checkpoint after EVERY dispatch, so
            # an interrupted block-mode run still leaves a (self-consistent)
            # best_model.npz behind (ADVICE round 1).
            if cfg.save_best and self.best_val_loss < prev_best:
                self._save_best(f"{cfg.checkpoint_dir}/best_model.npz")
            for cb in callbacks:
                cb(self, self.history[-1])
        if use_blocks:
            return self.history

        while self.epoch < epochs:
            ep = self.epoch
            beta = float(schedule[min(ep, len(schedule) - 1)])
            seq_len = int(prog[ep]) if ep < len(prog) else cfg.seq_len

            t0 = time.perf_counter()
            if cfg.jit_epoch:
                ms, val_metrics = self.run_epoch(data, val, beta, seq_len)
                val_loss = float(val_metrics["loss"])  # blocks
                wall = time.perf_counter() - t0
                train_loss = float(jnp.mean(ms["loss"]))
                rhs = int(jnp.sum(ms["n_rhs_evals"]))
            else:
                perm = self.np_rng.permutation(n)
                ep_metrics, val_metrics = [], None
                for s in range(steps_per_epoch):
                    idx = jnp.asarray(
                        perm[s * cfg.batch_size:(s + 1) * cfg.batch_size])
                    m = self.train_step(data, idx, beta, seq_len)
                    ep_metrics.append(m)
                    if cfg.val_every_batch:
                        val_metrics = self.val_step(val, beta)
                if val_metrics is None:
                    val_metrics = self.val_step(val, beta)
                # block for honest timing
                val_loss = float(val_metrics["loss"])
                wall = time.perf_counter() - t0
                train_loss = float(jnp.mean(jnp.stack(
                    [m["loss"] for m in ep_metrics])))
                rhs = int(sum(int(m["n_rhs_evals"]) for m in ep_metrics))
            rec = {"epoch": ep, "train_loss": train_loss,
                   "val_loss": val_loss, "beta": beta, "seq_len": seq_len,
                   "epoch_s": wall, "rhs_evals_per_s": rhs / wall}
            self.history.append(rec)
            if verbose and ep % log_every == 0:
                print(f"epoch {ep:4d}  loss {train_loss:10.4f}  "
                      f"val {val_loss:10.4f}  beta {beta:.3f}  "
                      f"seq {seq_len}  {wall:6.2f}s  "
                      f"{rec['rhs_evals_per_s']:.0f} rhs/s", flush=True)

            if cfg.save_best and val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.save(f"{cfg.checkpoint_dir}/best_model.npz")

            for cb in callbacks:
                cb(self, rec)
            self.epoch += 1
        return self.history

    # ------------------------------------------------------------------
    # checkpoint / resume (the reference has no resume — SURVEY.md §5)
    # ------------------------------------------------------------------
    def save(self, path: str):
        save_checkpoint(path, {"model": self.model,
                               "opt_state": self.opt_state,
                               "key": self.key},
                        meta={"epoch": self.epoch,
                              "best_val_loss": self.best_val_loss,
                              "np_rng": self.np_rng.bit_generator.state})

    @property
    def best_model(self):
        """The best-validation weights seen so far (block mode keeps them on
        device in the scan carry; otherwise the live model IS the best saved
        one at improvement time)."""
        if self._best_dev is not None:
            return jax.device_get(self._best_dev["model"])
        return self.model

    def _save_best(self, path: str):
        """Checkpoint the best-validation (weights, opt_state, epoch) as a
        consistent unit. RNG streams saved are the CURRENT ones (documented:
        resuming from a best checkpoint replays from the best epoch with the
        optimizer moments that produced it, not a bit-identical RNG tape)."""
        best = jax.device_get(self._best_dev)
        save_checkpoint(path, {"model": best["model"],
                               "opt_state": best["opt_state"],
                               "key": self.key},
                        meta={"epoch": int(best["epoch"]) + 1,
                              "best_val_loss": float(best["val"]),
                              "np_rng": self.np_rng.bit_generator.state})

    def restore(self, path: str):
        tree, meta = load_checkpoint(path, {"model": self.model,
                                            "opt_state": self.opt_state,
                                            "key": self.key})
        self.model = self._put_replicated(tree["model"])
        self.opt_state = self._put_replicated(tree["opt_state"])
        self.key = tree["key"]
        self.epoch = meta["epoch"]
        self.best_val_loss = meta["best_val_loss"]
        self.np_rng.bit_generator.state = meta["np_rng"]
        return self
