"""Data-parallel training over a device mesh.

The batch of independent calibration problems is sharded along the mesh's
``data`` axis; network/optimiser state is replicated.  Gradients are
reduced by XLA-inserted collectives (psum over the data axis) — no explicit
communication code.  Scene generation happens *inside* the sharded step, so
each device generates exactly its own shard of the batch and nothing
crosses the interconnect except gradients.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["make_dp_train_step"]


def make_dp_train_step(network, config, mesh: Mesh):
    """A jitted data-parallel train step over ``mesh``.

    State is replicated; the generated batch is constrained to be sharded
    batch-dim-first along the ``data`` axis so XLA partitions generation,
    the forward solve, and the backward pass, then all-reduces gradients.

    ``config`` is a :class:`davo_tpu.train.CalibrationExperiment` (imported
    lazily — the train package itself builds on this parallel package).
    """
    from davo_tpu.train.calibration import TrainState, _loss_and_metrics

    batch_fn = config.make_batch_fn()
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def _constrain_batch(tree):
        def _one(x):
            spec = [None] * x.ndim
            spec[0] = DATA_AXIS
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*spec))
            )

        return jax.tree_util.tree_map(_one, tree)

    @jax.jit
    def train_step(state: TrainState, key: jax.Array):
        data_key, drop_key = jax.random.split(key)
        batch = batch_fn(data_key, config.batch_size)
        batch = _constrain_batch(batch)

        def loss_fn(params):
            return _loss_and_metrics(
                network,
                params,
                state.batch_stats,
                batch,
                training=True,
                drop_key=drop_key,
                structure_weight=getattr(config, "structure_weight", 0.0),
            )

        grads, (metrics, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)
        return new_state, metrics

    return train_step
