"""Gen-1 object-protocol API: optimisable-function objects.

The reference's gen-1 stack drives solvers through an object contract
(``solvers/i_optimisable_function.py``): the objective owns its parameters
and data, exposes ``get_error`` / ``get_gradient`` / ``add`` /
``masked_update`` / ``as_parameters_vector``, and lazily caches
intermediates.  The TPU equivalent is a *pytree* wrapper over the
functional core (:mod:`davo_tpu.camera.pinhole_ba`): immutable, flows
through ``jit``/``vmap``/``lax`` unchanged, and needs no caches because
XLA CSE deduplicates repeated subexpressions inside one compiled program.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from davo_tpu.utils import masked_update as _masked_where
from .pinhole_ba import (
    PinholeBAConfig,
    PinholeBAData,
    PinholeBAParams,
    ba_add_vector,
    ba_error,
    ba_error_and_gradient,
    ba_params_to_vector,
    num_ba_parameters,
)

__all__ = ["IOptimisableFunction", "PinholeCameraModelL1"]


class IOptimisableFunction(abc.ABC):
    """The optimisable-function contract (reference
    ``solvers/i_optimisable_function.py:6-65``).

    Implementations must be registered pytrees whose leaves carry the
    batch dimensions ``(B, E, ...)``.
    """

    @property
    @abc.abstractmethod
    def batch_size(self) -> int: ...

    @property
    @abc.abstractmethod
    def num_estimates(self) -> int: ...

    @property
    @abc.abstractmethod
    def num_parameters(self) -> int: ...

    @abc.abstractmethod
    def get_error(self) -> jax.Array:
        """Total error per estimate, ``(B, E)``."""

    @abc.abstractmethod
    def get_gradient(self) -> jax.Array:
        """Gradient per estimate, ``(B, E, P)``."""

    @abc.abstractmethod
    def as_parameters_vector(self) -> jax.Array:
        """Flat parameters, ``(B, E, P)``."""

    @abc.abstractmethod
    def add(self, delta: jax.Array) -> "IOptimisableFunction":
        """A new instance at ``parameters + delta``."""

    @abc.abstractmethod
    def masked_update(
        self, other: "IOptimisableFunction", mask: jax.Array
    ) -> "IOptimisableFunction":
        """Take ``other`` where ``mask`` (shape ``(B, E)``) else self."""


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PinholeCameraModelL1(IOptimisableFunction):
    """The flagship gen-1 objective as an immutable pytree object
    (reference ``camera_model/pinhole_camera_model_l1.py:9-707``).

    Wraps :class:`PinholeBAParams` + observations + config; error/gradient
    delegate to the analytic functional core.
    """

    params: PinholeBAParams
    data: PinholeBAData
    config: PinholeBAConfig = PinholeBAConfig()

    # -- pytree plumbing (config is static metadata) ---------------------
    def tree_flatten(self):
        return (self.params, self.data), self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        params, data = children
        return cls(params=params, data=data, config=config)

    # -- protocol --------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.params.focal_length.shape[0]

    @property
    def num_estimates(self) -> int:
        return self.params.focal_length.shape[1]

    @property
    def num_parameters(self) -> int:
        return num_ba_parameters(self.params.num_views, self.params.num_points)

    def get_error(self) -> jax.Array:
        return ba_error(self.params, self.data, self.config)

    def get_gradient(self) -> jax.Array:
        _, gradient = ba_error_and_gradient(self.params, self.data, self.config)
        return gradient

    def get_error_and_gradient(self):
        return ba_error_and_gradient(self.params, self.data, self.config)

    def as_parameters_vector(self) -> jax.Array:
        return ba_params_to_vector(self.params)

    def add(self, delta: jax.Array) -> "PinholeCameraModelL1":
        return PinholeCameraModelL1(
            params=ba_add_vector(self.params, delta, self.config),
            data=self.data,
            config=self.config,
        )

    def masked_update(
        self, other: "PinholeCameraModelL1", mask: jax.Array
    ) -> "PinholeCameraModelL1":
        merged = jax.tree_util.tree_map(
            lambda cur, new: _masked_where(cur, new, mask),
            self.params,
            other.params,
        )
        return PinholeCameraModelL1(
            params=merged, data=self.data, config=self.config
        )
