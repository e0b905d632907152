from .modes import (AbstractSensealg, Unrolled, InterpolatingAdjoint,
                    BacksolveAdjoint)
from .odeint import odeint, SolveOptions

__all__ = [
    "AbstractSensealg", "Unrolled", "InterpolatingAdjoint",
    "BacksolveAdjoint", "odeint", "SolveOptions",
]
