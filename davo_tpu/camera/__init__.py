from .calibration_fast import calibration_error_fast
from .calibration import (
    CalibrationParameters,
    num_calibration_parameters,
    unpack_calibration_parameters,
    pack_calibration_parameters,
    get_camera_relative_points,
    calibration_error,
    BasinScoreConfig,
    basin_score,
)
from .distortion import (
    DISTORTED_PARAM_NAMES,
    NUM_DISTORTED_PARAMS,
    distorted_project,
    distorted_project_and_jacobian,
)
from .distorted_calibration import (
    DistortedSceneConfig,
    generate_distorted_scenes,
    refine_distorted,
    evaluate_distorted_calibration,
)
from .model_protocol import IOptimisableFunction, PinholeCameraModelL1
from .simple_parameters import (
    SimpleCameraModelParameters,
    NUM_SIMPLE_CAMERA_PARAMS,
)
from .pinhole_ba import (
    PinholeBAConfig,
    PinholeBAParams,
    PinholeBAData,
    num_ba_parameters,
    ba_params_to_vector,
    ba_params_from_vector,
    ba_add_vector,
    augmented_world_points,
    ba_camera_relative_points,
    ba_project,
    ba_error,
    ba_error_and_gradient,
)

__all__ = [
    "CalibrationParameters",
    "num_calibration_parameters",
    "unpack_calibration_parameters",
    "pack_calibration_parameters",
    "get_camera_relative_points",
    "calibration_error",
    "calibration_error_fast",
    "BasinScoreConfig",
    "basin_score",
    "DISTORTED_PARAM_NAMES",
    "NUM_DISTORTED_PARAMS",
    "distorted_project",
    "distorted_project_and_jacobian",
    "DistortedSceneConfig",
    "generate_distorted_scenes",
    "refine_distorted",
    "evaluate_distorted_calibration",
    "IOptimisableFunction",
    "PinholeCameraModelL1",
    "SimpleCameraModelParameters",
    "NUM_SIMPLE_CAMERA_PARAMS",
    "PinholeBAConfig",
    "PinholeBAParams",
    "PinholeBAData",
    "num_ba_parameters",
    "ba_params_to_vector",
    "ba_params_from_vector",
    "ba_add_vector",
    "augmented_world_points",
    "ba_camera_relative_points",
    "ba_project",
    "ba_error",
    "ba_error_and_gradient",
]
