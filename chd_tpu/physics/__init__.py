from .types import PhysInput, PhysWeights, PhysResult
from .prepare import prepare_input
from .collocation import solve_physics
from .apply import apply_results
