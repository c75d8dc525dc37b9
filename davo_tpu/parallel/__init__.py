from .mesh import make_mesh, replicate, shard_along, DATA_AXIS
from .data_parallel import make_dp_train_step

__all__ = [
    "make_mesh",
    "replicate",
    "shard_along",
    "DATA_AXIS",
    "make_dp_train_step",
]
