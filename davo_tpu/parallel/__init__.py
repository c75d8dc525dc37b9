from .mesh import (
    make_mesh,
    replicate,
    shard_along,
    initialize_distributed,
    DATA_AXIS,
)
from .data_parallel import make_dp_train_step
from .schur import (
    BAProblem,
    BAObservations,
    SchurConfig,
    ba_residuals,
    ba_cost,
    schur_normal_step,
    schur_ba_solve,
    distributed_schur_ba,
    default_gauge_masks,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_along",
    "initialize_distributed",
    "DATA_AXIS",
    "make_dp_train_step",
    "BAProblem",
    "BAObservations",
    "SchurConfig",
    "ba_residuals",
    "ba_cost",
    "schur_normal_step",
    "schur_ba_solve",
    "distributed_schur_ba",
    "default_gauge_masks",
]
