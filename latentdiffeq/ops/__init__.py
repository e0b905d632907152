"""Pallas TPU kernels for the hot paths (used via the model-type flags
``GOKUBasic(use_pallas_encoder=..., use_pallas_solver=...)`` and
``LatentODE(use_pallas_solve=...)``; pure-JAX paths remain the bit-exact
reference implementations)."""
from .node_pallas import pallas_solve_neural_field
from .ode_pallas import pallas_solve_fixed_grid_batched
from .recurrent_pallas import pallas_goku_heads

__all__ = ["pallas_solve_fixed_grid_batched", "pallas_goku_heads",
           "pallas_solve_neural_field"]
