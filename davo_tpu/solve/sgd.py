"""Fixed-iteration gradient descent with the same differentiability
contract as :func:`davo_tpu.solve.bfgs_solve`.

Feature parity target: ``autograd_solvers/sgd_solver.py`` in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["SGDConfig", "sgd_solve"]


@dataclasses.dataclass(frozen=True)
class SGDConfig:
    learning_rate: float = 1e-2
    iterations: int = 100


def sgd_solve(
    error_function: Callable[[jax.Array], jax.Array],
    parameters: jax.Array,
    config: SGDConfig = SGDConfig(),
    *,
    differentiable: bool = False,
) -> jax.Array:
    """``x <- x - lr * f'(x)`` for a fixed number of iterations, batched
    over leading dimensions.

    :param differentiable: if True the unrolled solve is
        reverse-differentiable (scan + remat); otherwise the result carries
        zero gradient, mirroring the reference's ``detach``.
    """

    def step(params, _):
        err, pullback = jax.vjp(error_function, params)
        (grad,) = pullback(jnp.ones_like(err))
        return params - config.learning_rate * grad, None

    def _solve(params):
        out, _ = jax.lax.scan(
            jax.checkpoint(step) if differentiable else step,
            params,
            None,
            length=config.iterations,
        )
        return out

    if differentiable:
        return _solve(parameters)

    solve = jax.custom_jvp(_solve)

    @solve.defjvp
    def _solve_jvp(primals, tangents):
        out = _solve(*primals)
        return out, jnp.zeros_like(out)

    return solve(jax.lax.stop_gradient(parameters))
