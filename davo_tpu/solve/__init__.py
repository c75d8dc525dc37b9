from .line_search import line_search_wolfe_conditions
from .bfgs import (
    BFGSConfig,
    bfgs_solve,
    update_inverse_hessian,
    scale_initial_inverse_hessian,
    clamp_search_direction,
)
from .lbfgs import LBFGSConfig, lbfgs_solve
from .sgd import SGDConfig, sgd_solve
from .protocol_solver import BFGSCameraSolverConfig, bfgs_solve_function
from .least_squares import (
    find_residuals,
    find_error,
    find_error_gradient,
    LMConfig,
    levenberg_marquardt,
)

__all__ = [
    "BFGSCameraSolverConfig",
    "bfgs_solve_function",
    "find_residuals",
    "find_error",
    "find_error_gradient",
    "LMConfig",
    "levenberg_marquardt",
    "line_search_wolfe_conditions",
    "LBFGSConfig",
    "lbfgs_solve",
    "BFGSConfig",
    "bfgs_solve",
    "update_inverse_hessian",
    "scale_initial_inverse_hessian",
    "clamp_search_direction",
    "SGDConfig",
    "sgd_solve",
]
