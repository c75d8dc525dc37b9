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
    distributed_schur_ba_2d,
    default_gauge_masks,
)
from .pose_graph import (
    WindowEdges,
    build_window_edges,
    distributed_stitch_windows,
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
    "distributed_schur_ba_2d",
    "default_gauge_masks",
    "WindowEdges",
    "build_window_edges",
    "distributed_stitch_windows",
]
