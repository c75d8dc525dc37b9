from .calibration import (
    CalibrationExperiment,
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    evaluate_calibration_ate,
    fit,
    fit_fov_curriculum,
)
from .optimisation import (
    OptimisationExperiment,
    create_optimisation_state,
    make_optimisation_train_step,
    fit_optimisation,
)
from .frontend import (
    FrontendExperiment,
    FrontendTrainState,
    create_frontend_state,
    make_frontend_train_step,
    fit_frontend,
)
from .learned_solver import (
    LearnedSolverExperiment,
    true_calibration_vector,
    fit_learned_solver,
    compare_with_bfgs,
)
from .presets import PRESETS, get_preset
from .config_io import load_config_yaml, apply_config_mapping
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
from .metrics import MetricsLogger, weight_summaries
from .vo_eval import (
    TrajectoryConfig,
    generate_trajectory,
    solve_windowed_vo,
    evaluate_vo,
)
from .evaluation import (
    camera_centers_from_poses,
    umeyama_alignment,
    absolute_trajectory_error,
    intrinsics_error,
)

__all__ = [
    "load_config_yaml",
    "apply_config_mapping",
    "CalibrationExperiment",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "evaluate_calibration_ate",
    "fit",
    "fit_fov_curriculum",
    "OptimisationExperiment",
    "create_optimisation_state",
    "make_optimisation_train_step",
    "fit_optimisation",
    "FrontendExperiment",
    "FrontendTrainState",
    "create_frontend_state",
    "make_frontend_train_step",
    "fit_frontend",
    "LearnedSolverExperiment",
    "true_calibration_vector",
    "fit_learned_solver",
    "compare_with_bfgs",
    "PRESETS",
    "get_preset",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "MetricsLogger",
    "weight_summaries",
    "TrajectoryConfig",
    "generate_trajectory",
    "solve_windowed_vo",
    "evaluate_vo",
    "camera_centers_from_poses",
    "umeyama_alignment",
    "absolute_trajectory_error",
    "intrinsics_error",
]
