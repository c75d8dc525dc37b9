"""The four canonical experiment presets of the reference repo, as
dataclass configs (replacing the LightningCLI YAML dependency-injection,
``configurations/*.yaml`` + ``camera_calibration_from_oracle_matches.py``).
"""

from __future__ import annotations

from davo_tpu.solve import BFGSConfig
from .calibration import CalibrationExperiment
from .optimisation import OptimisationExperiment

__all__ = ["PRESETS", "get_preset"]


def _calibration_from_oracle_matches() -> CalibrationExperiment:
    """The gen-2 scripted main: 4 views x 8 points, hidden 8*M*N, batch 64,
    128 train batches, 50 epochs
    (``camera_calibration_from_oracle_matches.py:34-75``)."""
    return CalibrationExperiment()


def _bfgs_solver_full_gradient() -> OptimisationExperiment:
    """Full grad-of-gradient training, 10 BFGS iters, zoom budget 20
    (``configurations/bfgs_solver_full_gradient_config.yaml``; fp64 there —
    on TPU we default f32 and validate parity empirically, see SURVEY §7.3).
    """
    return OptimisationExperiment(
        solver=BFGSConfig(
            error_threshold=1e-6,
            iterations=10,
            drop_path_p=0.0,
            line_search_iterations=40,
            max_step_size=1e5,
            zoom_method="interpolate",
        ),
    )


def _bfgs_solver_only_error_gradient() -> OptimisationExperiment:
    """fp32, 5 iters, zoom 5, max_step 32, error-gradient only
    (``configurations/bfgs_solver_only_error_gradient_config.yaml``)."""
    return OptimisationExperiment(
        solver=BFGSConfig(
            error_threshold=1e-6,
            iterations=5,
            drop_path_p=0.0,
            line_search_iterations=12,
            max_step_size=32.0,
        ),
    )


def _mlp_guess() -> OptimisationExperiment:
    """Guess-only ablation: 200 epochs, hidden 2048, batch 256
    (``configurations/mlp_guess_config.yaml``)."""
    return OptimisationExperiment(
        hidden_size=2048,
        batch_size=256,
        epochs=200,
        solver_enabled=False,
    )


def _calibration_transformer_curriculum() -> CalibrationExperiment:
    """The round-1 best recipe (see ROADMAP.md): transformer guess head
    trained purely supervised (no unrolled solve in training — it
    destabilises the head), full BFGS refinement at eval.  Reaches
    f-error ~0.77 / trajectory ATE ~0.98 after 300 epochs on one chip,
    vs ~14 / ~2.7 for the reference-style MLP+unrolled-solve recipe."""
    return CalibrationExperiment(
        epochs=300,
        head="transformer",
        learning_rate=3e-4,
        solver=BFGSConfig(
            error_threshold=1e-7,
            training_error_threshold=1e-3,
            iterations=100,
            training_iterations=0,
            line_search_iterations=50,
            drop_path_p=0.0,
        ),
    )


PRESETS = {
    "calibration_from_oracle_matches": _calibration_from_oracle_matches,
    "calibration_transformer_curriculum": _calibration_transformer_curriculum,
    "bfgs_solver_full_gradient": _bfgs_solver_full_gradient,
    "bfgs_solver_only_error_gradient": _bfgs_solver_only_error_gradient,
    "mlp_guess": _mlp_guess,
}


def get_preset(name: str):
    if name not in PRESETS:
        raise KeyError(
            f"Unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    return PRESETS[name]()
