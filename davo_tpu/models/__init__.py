from .calibration_network import (
    CalibrationNetwork,
    permutation_restart_guesses,
    CalibrationMLPHead,
    CalibrationTransformerHead,
)
from .init import kaiming_normal_init, kaiming_uniform_init, dense_kaiming
from .guess import (
    num_guess_parameters,
    guess_vector_to_params,
    PinholeMLPGuess,
    PinholeTransformerGuess,
    PinholeFixedGuess,
)
from .guess_and_solver import GuessAndSolverModel, InitialGuessModel, solve_ba
from .matcher import FeatureMatchModule, NFoldMatcherModule
from .detector import (
    UpscaleModule,
    UpscaleWithSkipModule,
    FeatureDetectionModule,
)
from .vo_frontend import VOFrontend, FrontendOutput, select_matches
from .learned_solvers import (
    MLPSolverStep,
    MLPSolver,
    TransformerSolverStep,
    TransformerSolver,
    SearchDirectionHeuristic,
)

__all__ = [
    "CalibrationNetwork",
    "permutation_restart_guesses",
    "CalibrationMLPHead",
    "CalibrationTransformerHead",
    "kaiming_normal_init",
    "kaiming_uniform_init",
    "dense_kaiming",
    "num_guess_parameters",
    "guess_vector_to_params",
    "PinholeMLPGuess",
    "PinholeTransformerGuess",
    "PinholeFixedGuess",
    "GuessAndSolverModel",
    "InitialGuessModel",
    "solve_ba",
    "FeatureMatchModule",
    "NFoldMatcherModule",
    "UpscaleModule",
    "UpscaleWithSkipModule",
    "FeatureDetectionModule",
    "VOFrontend",
    "FrontendOutput",
    "select_matches",
    "MLPSolverStep",
    "MLPSolver",
    "TransformerSolverStep",
    "TransformerSolver",
    "SearchDirectionHeuristic",
]
