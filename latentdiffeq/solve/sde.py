"""SDE solvers: SRA1 / SRIW1 (strong order 1.5), Euler-Maruyama, Heun.

Covers the reference's ``SDEProblem`` capability — the additive-noise
stochastic pendulum solved with ``SOSRI()``, an adaptive strong-order-1.5
method (reference: examples/pendulum_friction-less/pendulum.jl:96-140, 103).
Two strong-1.5 methods fill that role (Rossler 2010, "Runge-Kutta methods
for the strong approximation of solutions of stochastic differential
equations", SIAM J. Numer. Anal. 48(3)):

- **SRA1** (Sec. 6): additive noise (``g`` independent of the state);
  the default for the stochastic pendulum, whose noise is constant.
- **SRIW1** (Sec. 5.1, exported also as :data:`SOSRI`): DIAGONAL noise —
  ``g`` may depend on the state elementwise — the actual noise class of
  StochasticDiffEq's ``SOSRI()``. A user bringing a multiplicative-noise
  SDE gets the same order here that the reference gets from
  StochasticDiffEq.

Both are available on a fixed grid and with **adaptive dyadic stepping**
(:func:`solve_sde_adaptive`).

All solvers consume a *virtual-Brownian-tree* path (solve/brownian.py):
the path is a fixed function of the PRNG key, so a ``substeps`` refinement
(powers of two) or an adaptive step-sequence change samples the SAME path
— the refinement-consistency property StochasticDiffEq gets from its
rejection-stack (RSwM), rebuilt here without mutable state so it vmaps and
scans on TPU. Gradients are pathwise (reparameterized) through the
deterministic increments.

SRA1 tableau (c0=(0,3/4), A0_21=3/4, alpha=(1/3,2/3); c1=(1,0), B0_21=3/2,
beta1=(1,0), beta2=(-1,1)): with I(1,0) = int (W(s)-W(t)) ds over the step,

    f1 = f(y, t);  chi = I(1,0)/h
    H2 = y + (3/4) h f1 + (3/2) chi g(t+h)
    f2 = f(H2, t + (3/4) h)
    y1 = y + h (f1 + 2 f2)/3 + dW g(t+h) + chi (g(t) - g(t+h))

For constant additive noise the beta2 terms cancel and the drift update is
Ralston's 2nd-order RK, which supplies the embedded error estimate
``err = (2h/3)(f2 - f1)`` used by the adaptive controller (drift-dominant,
the same structure StochasticDiffEq's SRA adaptivity uses).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .brownian import bridge_increments, vbt_query

__all__ = ["EulerMaruyama", "StochasticHeun", "SRA1", "SRIW1", "SOSRI",
           "solve_sde_fixed_grid", "solve_sde_adaptive",
           "SDEAdaptiveConfig", "AbstractSDESolver"]


@dataclasses.dataclass(frozen=True)
class AbstractSDESolver:
    pass


@dataclasses.dataclass(frozen=True)
class EulerMaruyama(AbstractSDESolver):
    """y1 = y + f dt + g dW. Strong order 0.5 (1.0 for additive noise)."""


@dataclasses.dataclass(frozen=True)
class StochasticHeun(AbstractSDESolver):
    """Drift-Heun with additive/diagonal noise: strong order 1.0, weak 2.0
    for additive noise."""


@dataclasses.dataclass(frozen=True)
class SRA1(AbstractSDESolver):
    """Rossler SRA1: strong order 1.5 / weak order 2 for ADDITIVE noise
    (g must not depend on y; time dependence is fine). The SOSRI-role
    default for the stochastic pendulum (reference: pendulum.jl:103)."""


@dataclasses.dataclass(frozen=True)
class SRIW1(AbstractSDESolver):
    """Rossler SRIW1 (2010, Sec. 5.1): strong order 1.5 / weak order 2 for
    DIAGONAL noise — ``g(y, p, t)`` may depend on the state elementwise
    (each state dimension driven by its own scalar Wiener process, the
    ``SDEProblem`` noise contract of the reference's stochastic pendulum
    generalized to multiplicative noise). This is the noise class of the
    reference's ``SOSRI()`` (an SRI-family method, pendulum.jl:103);
    :data:`SOSRI` aliases this class for API parity.

    Per-component iterated integrals beyond ``(dW, I(1,0))`` are closed
    forms of the scalar increment (Kloeden & Platen):
    ``I(1,1) = (dW^2 - h)/2``, ``I(1,1,1) = (dW^3 - 3 h dW)/6`` — no extra
    path state, so the method consumes the same virtual-Brownian-tree
    cells as SRA1 and inherits refinement consistency and adaptive dyadic
    stepping unchanged.
    """


def _em_step(f, g, y, p, t, dt, dw, i10):
    return y + dt * f(y, p, t) + g(y, p, t) * dw, None


def _heun_step(f, g, y, p, t, dt, dw, i10):
    gy = g(y, p, t)
    f1 = f(y, p, t)
    y_pred = y + dt * f1 + gy * dw
    f2 = f(y_pred, p, t + dt)
    g2 = g(y_pred, p, t + dt)
    return y + 0.5 * dt * (f1 + f2) + 0.5 * (gy + g2) * dw, None


def _sra1_step(f, g, y, p, t, dt, dw, i10):
    f1 = f(y, p, t)
    g_end = g(y, p, t + dt)
    g_start = g(y, p, t)
    chi = i10 / dt
    h2 = y + 0.75 * dt * f1 + 1.5 * chi * g_end
    f2 = f(h2, p, t + 0.75 * dt)
    y1 = (y + dt * (f1 + 2.0 * f2) / 3.0 + dw * g_end
          + chi * (g_start - g_end))
    err = (2.0 * dt / 3.0) * (f2 - f1)
    return y1, err


def _sriw1_step(f, g, y, p, t, dt, dw, i10):
    """One SRIW1 step (Rossler 2010, Sec. 5.1 tableau) for diagonal noise.

    Tableau (strictly lower triangular, 4 stages):
      c0 = (0, 3/4, 0, 0)        A0_21 = 3/4            alpha = (1/3, 2/3, 0, 0)
      c1 = (0, 1/4, 1, 1/4)      A1_21 = 1/4, A1_31 = 1, A1_43 = 1/4
      B0_21 = 3/2
      B1_21 = 1/2, B1_31 = -1, B1_41..43 = (-5, 3, 1/2)
      beta1 = (-1, 4/3, 2/3, 0)   beta2 = (-1, 4/3, -1/3, 0)
      beta3 = (2, -4/3, -2/3, 0)  beta4 = (-2, 5/3, -2/3, 1)

    Update (per component; W scalar per dimension):
      y1 = y + h sum_i alpha_i f(H0_i)
             + sum_i [b1_i I1 + b2_i I11/sqrt(h) + b3_i I10/h
                      + b4_i I111/h] g(H1_i)
    with I1 = dW, I11 = (dW^2 - h)/2, I111 = (dW^3 - 3 h dW)/6.

    Note A0 rows 3-4 and B0 rows 3-4 are zero, so H0_3 = H0_4 = y and only
    f(H0_1), f(H0_2) are ever needed (alpha_3 = alpha_4 = 0; A1_43 consumes
    f(H0_3) = f1).

    Embedded error (the natural-embedding structure of Rackauckas & Nie
    2017, "Adaptive methods for SDEs via natural embeddings and rejection
    sampling with memory", and the same drift pair as this module's SRA1):
    the lower-order member drops the order-1.5 corrections — the embedded
    Ralston/Euler drift difference (2h/3)(f2 - f1) plus the beta3/beta4
    noise-correction terms, which are exactly the terms multiplying
    I(1,0)/h and I(1,1,1)/h.
    """
    sqh = jnp.sqrt(dt)
    i11 = 0.5 * (dw * dw - dt)
    i111 = (dw * dw * dw - 3.0 * dt * dw) / 6.0
    chi = i10 / dt

    f1 = f(y, p, t)
    g1 = g(y, p, t)
    h0_2 = y + 0.75 * dt * f1 + 1.5 * chi * g1
    h1_2 = y + 0.25 * dt * f1 + 0.5 * sqh * g1
    f2 = f(h0_2, p, t + 0.75 * dt)
    g2 = g(h1_2, p, t + 0.25 * dt)
    h1_3 = y + dt * f1 - sqh * g1
    g3 = g(h1_3, p, t + dt)
    h1_4 = y + 0.25 * dt * f1 + sqh * (-5.0 * g1 + 3.0 * g2 + 0.5 * g3)
    g4 = g(h1_4, p, t + 0.25 * dt)

    b1 = -g1 + (4.0 / 3.0) * g2 + (2.0 / 3.0) * g3
    b2 = -g1 + (4.0 / 3.0) * g2 - (1.0 / 3.0) * g3
    e3 = 2.0 * g1 - (4.0 / 3.0) * g2 - (2.0 / 3.0) * g3
    e4 = -2.0 * g1 + (5.0 / 3.0) * g2 - (2.0 / 3.0) * g3 + g4

    noise15 = e3 * chi + e4 * (i111 / dt)
    y1 = (y + dt * (f1 + 2.0 * f2) / 3.0
          + b1 * dw + b2 * (i11 / sqh) + noise15)
    err = (2.0 * dt / 3.0) * (f2 - f1) + noise15
    return y1, err


_STEPPERS = {
    EulerMaruyama: (_em_step, 1),
    StochasticHeun: (_heun_step, 2),
    SRA1: (_sra1_step, 2),
    SRIW1: (_sriw1_step, 2),
}

# methods whose stepper returns a usable embedded error estimate — the set
# solve_sde_adaptive accepts
_EMBEDDED = (SRA1, SRIW1)

#: API-parity alias: the reference's stochastic-pendulum solver is
#: ``SOSRI()`` (pendulum.jl:103), an SRI-family diagonal-noise method;
#: ``SDEDynamics(solver=SOSRI())`` here runs the SRIW1 tableau (same
#: family, same strong order 1.5, same diagonal-noise class — the
#: "SOSRI" name itself refers to stability-optimized coefficients of the
#: same scheme shape).
SOSRI = SRIW1


def _stepper(solver):
    for cls, entry in _STEPPERS.items():
        if isinstance(solver, cls):
            return entry
    raise ValueError(f"unknown SDE solver {solver}")


def solve_sde_fixed_grid(f: Callable, g: Callable, solver: AbstractSDESolver,
                         u0, p, saveat, key, *, substeps: int = 1,
                         checkpoint: bool = False):
    """Integrate the SDE across ``saveat`` (T,) with ``substeps`` (a power
    of two) method steps per save interval. Returns (ys, success, stats).

    ``key`` indexes the Brownian path: the same key at any power-of-two
    ``substeps`` refinement integrates the SAME path (virtual Brownian
    tree), so refinement studies converge pathwise — the property the
    reference inherits from StochasticDiffEq's bridge machinery.
    """
    step, evals_per = _stepper(solver)

    n = saveat.shape[0] - 1
    dts = (saveat[1:] - saveat[:-1]) / substeps
    dws, i10s = bridge_increments(key, saveat, substeps, u0.shape, u0.dtype)
    # i10 of a sub-cell relative to the interval is relative to its own
    # start already (bridge convention) — exactly what one step consumes.

    def interval(y, xs):
        ta, dt, dw, i10 = xs
        for j in range(substeps):
            y, _ = step(f, g, y, p, ta + j * dt, dt, dw[j], i10[j])
        return y, y

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, ys_tail = jax.lax.scan(interval, u0, (saveat[:-1], dts, dws, i10s))
    ys = jnp.concatenate([u0[None], ys_tail], axis=0)
    success = jnp.all(jnp.isfinite(ys))
    stats = {
        "n_rhs_evals": jnp.asarray(n * substeps * evals_per, jnp.int32),
        "n_accepted": jnp.asarray(n * substeps, jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
    }
    return ys, success, stats


@dataclasses.dataclass(frozen=True)
class SDEAdaptiveConfig:
    # StochasticDiffEq's SDE defaults are abstol=1e-2, reltol=1e-2 — the
    # tolerances the reference's SOSRI() actually runs at. A much tighter
    # atol is actively harmful in TRAINING: early latent states are tiny,
    # the controller goes atol-dominated, trajectories refine deep /
    # exhaust the budget, and masked-out samples feel only KL pressure
    # (a posterior-collapse driver — measured, benchmarks/RESULTS.md
    # round-3 SDE notes).
    rtol: float = 1e-2
    atol: float = 1e-2
    max_steps: int = 1024
    # dyadic refinement bounds: step = interval / 2^k, k in [0, depth_cap]
    depth_cap: int = 10
    # coarsen (double the step) when the error norm falls below this and
    # the position allows it; err ~ h^2 (drift-embedded), so 0.2 leaves a
    # 4x-to-threshold margin after doubling
    coarsen_below: float = 0.2
    # >0: cap the scan budget at `max_steps_per_interval * n_intervals`
    # (still <= max_steps). The save grid's length is static under jit, so
    # a short grid (e.g. a progressive-training curriculum stage) compiles
    # a proportionally shorter masked scan instead of paying the full
    # max_steps budget. 0 = always max_steps.
    max_steps_per_interval: int = 0
    # Difficulty-bound stepping: chunked while_loop that exits when every
    # vmapped trajectory is done/failed (see AdaptiveConfig.early_exit).
    # Forward/inference only — pathwise gradients need the bounded scan.
    early_exit: bool = False
    chunk_size: int = 32


def solve_sde_adaptive(f: Callable, g: Callable, solver: AbstractSDESolver,
                       u0, p, saveat, key,
                       cfg: SDEAdaptiveConfig = SDEAdaptiveConfig()):
    """Adaptive SDE integration: dyadic step bisection per save interval.

    The TPU-native answer to ``SOSRI()``'s adaptivity (reference:
    pendulum.jl:103): steps are ``interval / 2^k`` with per-trajectory ``k``
    driven by the embedded drift-error estimate — halve on rejection,
    double when comfortably inside tolerance. Every step is a dyadic cell
    of the virtual Brownian tree, so accepted AND rejected steps consume
    exact-law path values and a rejection never perturbs the path
    (the role of StochasticDiffEq's RSwM, without the mutable stack).
    Runs as a bounded masked `lax.scan` like solve_adaptive — vmap-friendly,
    reverse-differentiable through accepted stage values.

    Returns ``(ys, success, stats)``; only solvers with an embedded error
    (SRA1 for additive noise, SRIW1/SOSRI for diagonal noise) are
    supported.
    """
    step, evals_per = _stepper(solver)
    if not isinstance(solver, _EMBEDDED):
        raise ValueError("adaptive SDE stepping requires an embedded error "
                         "estimate; use SRA1 or SRIW1/SOSRI "
                         "(or solve_sde_fixed_grid)")
    dtype = u0.dtype
    saveat = saveat.astype(dtype)
    T = saveat.shape[0]
    n_int = T - 1

    ys0 = jnp.concatenate(
        [u0[None], jnp.full((T - 1,) + u0.shape, jnp.nan, dtype)], axis=0)
    carry0 = dict(
        i=jnp.asarray(0, jnp.int32), m=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(0, jnp.int32), y=u0,
        done=jnp.asarray(n_int == 0), fail=jnp.asarray(False),
        ys=ys0,
        n_acc=jnp.asarray(0, jnp.int32), n_rej=jnp.asarray(0, jnp.int32),
        k_max=jnp.asarray(0, jnp.int32),
    )

    def body(c, _):
        active = ~(c["done"] | c["fail"])
        i = jnp.minimum(c["i"], n_int - 1)
        h_i = saveat[i + 1] - saveat[i]
        pow_k = jnp.asarray(1, jnp.int32) << c["k"]
        hstep = h_i / pow_k.astype(dtype)
        t = saveat[i] + c["m"].astype(dtype) * hstep

        dw, i10 = vbt_query(key, i, h_i, c["k"], c["m"], u0.shape,
                            cfg.depth_cap, dtype)
        y1, err = step(f, g, c["y"], p, t, hstep, dw, i10)

        sg = jax.lax.stop_gradient
        sc = cfg.atol + cfg.rtol * jnp.maximum(jnp.abs(sg(c["y"])),
                                               jnp.abs(sg(y1)))
        en = jnp.sqrt(jnp.mean((sg(err) / sc) ** 2))
        finite = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(en)
        accept = (en <= 1.0) & finite

        step_ok = accept & active
        m_new = c["m"] + 1
        crossed = step_ok & (m_new >= pow_k)
        i_new = jnp.where(crossed, c["i"] + 1, c["i"])
        m_new = jnp.where(crossed, 0, jnp.where(step_ok, m_new, c["m"]))

        # coarsen: comfortably inside tolerance and on an even cell boundary
        can_coarsen = (c["k"] > 0) & (en <= cfg.coarsen_below) \
            & (m_new % 2 == 0)
        k_acc = jnp.where(can_coarsen, c["k"] - 1, c["k"])
        m_acc = jnp.where(can_coarsen, m_new // 2, m_new)
        # refine on reject: same position, half step
        at_cap = c["k"] >= cfg.depth_cap
        k_rej = jnp.minimum(c["k"] + 1, cfg.depth_cap)
        m_rej = c["m"] * 2

        new = dict(
            i=jnp.where(step_ok, i_new, c["i"]),
            m=jnp.where(step_ok, m_acc,
                        jnp.where(active & ~accept, m_rej, c["m"])),
            k=jnp.where(step_ok, k_acc,
                        jnp.where(active & ~accept, k_rej, c["k"])),
            y=jnp.where(step_ok, y1, c["y"]),
            done=c["done"] | (crossed & (i_new >= n_int)),
            fail=c["fail"] | (active & ~accept & at_cap),
            ys=jnp.where(crossed,
                         c["ys"].at[jnp.minimum(i + 1, n_int)].set(y1),
                         c["ys"]),
            n_acc=c["n_acc"] + step_ok.astype(jnp.int32),
            n_rej=c["n_rej"] + (active & ~accept).astype(jnp.int32),
            # deepest refinement level this trajectory stepped at — the
            # autosize probe reads it to shrink depth_cap (the masked
            # vbt_query descent length, a static per-step cost)
            k_max=jnp.where(active, jnp.maximum(c["k_max"], c["k"]),
                            c["k_max"]),
        )
        return new, None

    budget = cfg.max_steps
    if cfg.max_steps_per_interval > 0:
        budget = min(budget, cfg.max_steps_per_interval * max(n_int, 1))
    if cfg.early_exit:
        def w_cond(state):
            c, n = state
            return jnp.any(~(c["done"] | c["fail"])) & (n < budget)

        def w_body(state):
            c, n = state
            c, _ = jax.lax.scan(body, c, None, length=cfg.chunk_size)
            return c, n + cfg.chunk_size

        final, _ = jax.lax.while_loop(
            w_cond, w_body, (carry0, jnp.asarray(0, jnp.int32)))
    else:
        final, _ = jax.lax.scan(body, carry0, None, length=budget)
    fail = final["fail"] | ~final["done"]
    success = ~fail & jnp.all(jnp.isfinite(final["ys"]))
    attempts = final["n_acc"] + final["n_rej"]
    stats = {
        "n_rhs_evals": attempts * evals_per,
        "n_accepted": final["n_acc"],
        "n_rejected": final["n_rej"],
        "max_depth": final["k_max"],
    }
    return final["ys"], success, stats
