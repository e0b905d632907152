from .problem import ODEProblem, SDEProblem, Solution, remake
from .rk import (AbstractSolver, Euler, Midpoint, RK4, Tsit5, Dopri5,
                 ButcherTableau, rk_step, interpolate_dense)
from .sde import (AbstractSDESolver, EulerMaruyama, StochasticHeun, SRA1,
                  SRIW1, SOSRI, solve_sde_fixed_grid, solve_sde_adaptive,
                  SDEAdaptiveConfig)
from .fixed import solve_fixed_grid
from .adaptive import solve_adaptive, AdaptiveConfig
from .api import solve, solve_ensemble, make_options, autosize_max_steps

__all__ = [
    "ODEProblem", "SDEProblem", "Solution", "remake",
    "AbstractSolver", "Euler", "Midpoint", "RK4", "Tsit5", "Dopri5",
    "ButcherTableau", "rk_step", "interpolate_dense",
    "AbstractSDESolver", "EulerMaruyama", "StochasticHeun", "SRA1",
    "SRIW1", "SOSRI",
    "solve_sde_fixed_grid", "solve_sde_adaptive", "SDEAdaptiveConfig",
    "solve_fixed_grid", "solve_adaptive", "AdaptiveConfig",
    "solve", "solve_ensemble", "make_options", "autosize_max_steps",
]
