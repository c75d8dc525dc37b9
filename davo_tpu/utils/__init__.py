from .precision import full_f32_matmuls
from .stable_trig import (
    sin_x_on_x,
    one_minus_cos_x_on_x_squared,
    cos_x_on_x_squared_minus_sin_x_on_x_cubed,
    sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth,
)
from .guards import (
    safe_reciprocal,
    safe_norm,
    guarded_sqrt,
    inverse_curvature,
    interpolate_alpha,
    project_vector_onto_axis,
    straight_through_max,
)
from .masked import (
    broadcast_mask,
    masked_update,
    masked_update_tree,
    masked_merge_tensors,
)
from .profiling import trace, timed, debug_nans

__all__ = [
    "full_f32_matmuls",
    "sin_x_on_x",
    "one_minus_cos_x_on_x_squared",
    "cos_x_on_x_squared_minus_sin_x_on_x_cubed",
    "sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth",
    "safe_reciprocal",
    "safe_norm",
    "guarded_sqrt",
    "inverse_curvature",
    "interpolate_alpha",
    "project_vector_onto_axis",
    "straight_through_max",
    "broadcast_mask",
    "masked_update",
    "masked_update_tree",
    "masked_merge_tensors",
    "trace",
    "timed",
    "debug_nans",
]
