"""Explicit Runge–Kutta methods: tableaus, steps, dense output.

From-scratch diffrax-style solvers replacing the reference's delegation to
OrdinaryDiffEq.jl (``Tsit5()`` default at
examples/pendulum_friction-less/pendulum.jl:11; solve call at
src/models/GOKU.jl:121). The stage loop unrolls at trace time (s <= 7), so
each step is a handful of fused VPU/MXU ops under XLA; the batched (vmapped)
RHS evaluations are where the FLOPs live.

Tableaus are stored in float64 and cast to the working dtype at use.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

__all__ = [
    "ButcherTableau", "Euler", "Midpoint", "RK4", "Tsit5", "Dopri5",
    "rk_step", "interpolate_dense", "AbstractSolver",
]


@dataclasses.dataclass(frozen=True)
class ButcherTableau:
    c: tuple          # (s,)
    a: tuple          # tuple of tuples, strictly lower triangular rows
    b: tuple          # (s,) solution weights
    b_err: tuple      # (s,) error weights (b - b_hat), or None for fixed-only
    order: int
    fsal: bool        # last stage == f(t+dt, y1)
    interpolation: str  # "hermite" | "tsit5" | "dopri5" | "linear"


@dataclasses.dataclass(frozen=True)
class AbstractSolver:
    """Solver tag. Hashable => usable as static jit metadata inside model
    pytrees (the reference passes ``Tsit5()`` structs around the same way,
    pendulum.jl:11)."""

    @property
    def tableau(self) -> ButcherTableau:
        raise NotImplementedError

    @property
    def is_adaptive_capable(self) -> bool:
        return self.tableau.b_err is not None


# ---------------------------------------------------------------------------
# Tableaus
# ---------------------------------------------------------------------------

_EULER = ButcherTableau(
    c=(0.0,), a=((),), b=(1.0,), b_err=None, order=1, fsal=False,
    interpolation="linear",
)

_MIDPOINT = ButcherTableau(
    c=(0.0, 0.5), a=((), (0.5,)), b=(0.0, 1.0), b_err=None, order=2,
    fsal=False, interpolation="linear",
)

_RK4 = ButcherTableau(
    c=(0.0, 0.5, 0.5, 1.0),
    a=((), (0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
    b=(1 / 6, 1 / 3, 1 / 3, 1 / 6),
    b_err=None, order=4, fsal=False, interpolation="hermite_recompute",
)

# Tsitouras 5(4) — coefficients from Tsitouras (2011), "Runge–Kutta pairs of
# order 5(4) satisfying only the first column simplifying assumption".
# Same method as OrdinaryDiffEq's Tsit5 (the reference's default solver).
_TSIT5 = ButcherTableau(
    c=(0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0),
    a=(
        (),
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (5.325864828439257, -11.748883564062828, 7.4955393428898365,
         -0.09249506636175525),
        (5.86145544294642, -12.92096931784711, 8.159367898576159,
         -0.071584973281401, -0.028269050394068383),
        (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
         -3.290069515436081, 2.324710524099774),
    ),
    b=(0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
       -3.290069515436081, 2.324710524099774, 0.0),
    b_err=(-0.00178001105222577714, -0.0008164344596567469,
           0.007880878010261995, -0.1447110071732629, 0.5823571654525552,
           -0.45808210592918697, 0.015151515151515152),
    order=5, fsal=True, interpolation="tsit5",
)

# Dormand–Prince 5(4) with Hairer's 4th-order continuous extension.
_DOPRI5 = ButcherTableau(
    c=(0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    a=(
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    b=(35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    b_err=(71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
           22 / 525, -1 / 40),
    order=5, fsal=True, interpolation="dopri5",
)

# Hairer's dense-output coefficients for DOPRI5 (DOPRI5.f, CONTD5).
_DOPRI5_D = (
    -12715105075 / 11282082432, 0.0, 87487479700 / 32700410799,
    -10690763975 / 1880347072, 701980252875 / 199316789632,
    -1453857185 / 822651844, 69997945 / 29380423,
)


def _tsit5_b_theta(th):
    """Tsit5's own 4th-order continuous extension b_i(theta) (Tsitouras 2011;
    the interpolant OrdinaryDiffEq uses for Tsit5 ``saveat`` dense output —
    the reference relies on it at src/models/GOKU.jl:121). Each b_i is a
    degree-4 polynomial with b_i(0) = 0 and b_i(1) = b_i (the solution
    weights), so the extension is C0-consistent at both step endpoints."""
    b1 = (-1.0530884977290216 * th * (th - 1.3299890189751412)
          * (th * th - 1.4364028541716351 * th + 0.7139816917074209))
    b2 = 0.1017 * th**2 * (th * th - 2.1966568338249754 * th
                           + 1.2949852507374631)
    b3 = (2.490627285651252793 * th**2
          * (th * th - 2.38535645472061657 * th + 1.57803468208092486))
    b4 = (-16.54810288924490272 * (th - 1.21712927295533244)
          * (th - 0.61620406037800089) * th**2)
    b5 = (47.37952196281928122 * (th - 1.203071208372362603)
          * (th - 0.658047292653547382) * th**2)
    b6 = (-34.87065786149660974 * (th - 1.2)
          * (th - 0.666666666666666667) * th**2)
    b7 = 2.5 * (th - 1.0) * (th - 0.6) * th**2
    return (b1, b2, b3, b4, b5, b6, b7)


@dataclasses.dataclass(frozen=True)
class Euler(AbstractSolver):
    @property
    def tableau(self):
        return _EULER


@dataclasses.dataclass(frozen=True)
class Midpoint(AbstractSolver):
    @property
    def tableau(self):
        return _MIDPOINT


@dataclasses.dataclass(frozen=True)
class RK4(AbstractSolver):
    @property
    def tableau(self):
        return _RK4


@dataclasses.dataclass(frozen=True)
class Tsit5(AbstractSolver):
    @property
    def tableau(self):
        return _TSIT5


@dataclasses.dataclass(frozen=True)
class Dopri5(AbstractSolver):
    @property
    def tableau(self):
        return _DOPRI5


# ---------------------------------------------------------------------------
# Stepping
# ---------------------------------------------------------------------------

def rk_step(f: Callable, tab: ButcherTableau, y, p, t, dt, f0=None,
            with_error: bool = True):
    """One explicit RK step.

    Returns ``(y1, err, ks)``. ``f0`` reuses the FSAL derivative from the
    previous accepted step. Stages whose ``b``/``b_err``/``a``-column weights
    are all zero are skipped at trace time (e.g. Tsit5's 7th stage in
    fixed-step mode).
    """
    s = len(tab.b)
    need_err = with_error and tab.b_err is not None
    if not need_err:
        # Fixed-step mode: trailing stages with zero solution weight are
        # never used (e.g. Tsit5's FSAL 7th stage) — skip them at trace time.
        s = max(i for i in range(s) if tab.b[i] != 0.0) + 1
    ks = []
    for i in range(s):
        if i == 0:
            k = f0 if f0 is not None else f(y, p, t)
        else:
            yi = y
            for j, aij in enumerate(tab.a[i]):
                if aij != 0.0:
                    yi = yi + (dt * aij) * ks[j]
            k = f(yi, p, t + tab.c[i] * dt)
        ks.append(k)

    y1 = y
    for bi, k in zip(tab.b, ks):
        if bi != 0.0:
            y1 = y1 + (dt * bi) * k

    err = None
    if need_err:
        err = jnp.zeros_like(y)
        for bei, k in zip(tab.b_err, ks):
            if bei != 0.0:
                err = err + (dt * bei) * k
    return y1, err, ks


def n_solution_stages(tab: ButcherTableau) -> int:
    """Stages with nonzero solution weight — the fixed-step stage count.
    Trailing zero-b stages (e.g. Tsit5's FSAL 7th) are skipped at trace
    time; every fixed-step path and kernel must agree on this count."""
    return max(i for i in range(len(tab.b)) if tab.b[i] != 0.0) + 1


def n_evals_per_step(tab: ButcherTableau, with_error: bool) -> int:
    """RHS evaluations per step, accounting for FSAL reuse and skipped
    zero-weight trailing stages."""
    s = len(tab.b)
    if not with_error or tab.b_err is None:
        # trailing stages with zero b-weight are skipped
        last = max(i for i in range(s) if tab.b[i] != 0.0)
        s = last + 1
    evals = s
    if tab.fsal:
        evals -= 1  # k1 reused from previous step (amortized)
    return max(evals, 1)


# ---------------------------------------------------------------------------
# Dense output
# ---------------------------------------------------------------------------

def interpolate_dense(tab: ButcherTableau, y0, y1, ks, dt, theta):
    """Evaluate the step's continuous extension at ``theta`` in [0, 1].

    ``theta`` may be a vector (T,); returns (T, dim). Used to emit ``saveat``
    points without forcing steps onto them (the reference relies on
    OrdinaryDiffEq's dense output for ``saveat=t``, GOKU.jl:121).
    """
    theta = jnp.asarray(theta)
    th = theta[..., None]  # broadcast over state dim

    if tab.interpolation == "linear":
        return y0 + th * (y1 - y0)

    if tab.interpolation == "tsit5":
        bs = _tsit5_b_theta(th)
        out = y0
        for bi, k in zip(bs, ks):
            out = out + (dt * bi) * k
        return out

    if tab.interpolation == "dopri5":
        k1, k3, k4, k5, k6, k7 = ks[0], ks[2], ks[3], ks[4], ks[5], ks[6]
        d = _DOPRI5_D
        ydiff = y1 - y0
        bspl = dt * k1 - ydiff
        r4 = ydiff - dt * k7 - bspl
        r5 = dt * (d[0] * k1 + d[2] * k3 + d[3] * k4 + d[4] * k5
                   + d[5] * k6 + d[6] * k7)
        return y0 + th * (ydiff + (1 - th) * (bspl + th * (r4 + (1 - th) * r5)))

    # Cubic Hermite using endpoint derivatives (FSAL gives f1 for free).
    f0 = ks[0]
    f1 = ks[-1] if tab.fsal else None
    if f1 is None:
        # Fall back to a quadratic using f0 only.
        return y0 + th * dt * f0 + th * th * (y1 - y0 - dt * f0)
    h00 = 2 * th**3 - 3 * th**2 + 1
    h10 = th**3 - 2 * th**2 + th
    h01 = -2 * th**3 + 3 * th**2
    h11 = th**3 - th**2
    return h00 * y0 + h10 * dt * f0 + h01 * y1 + h11 * dt * f1
