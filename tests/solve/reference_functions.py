"""Canonical optimisation landscapes for solver correctness tests.

Same battery as the reference's ``tests/autograd_solvers/reference_functions.py``
(sphere, log-sphere, Rosenbrock, Rastrigin, Beale, Bukin6, Easom), written
for jnp arrays with a trailing parameter dimension.
"""

import jax.numpy as jnp


def square_error(x):
    """Sphere function; global minimum 0 at the origin."""
    return jnp.sum(jnp.square(x), axis=-1)


def log_square_error(x):
    """log(1 + sum x^2); vanishing gradients far out; minimum at origin."""
    return jnp.log(1.0 + jnp.sum(jnp.square(x), axis=-1))


def rosenbrock_function(params):
    """Rosenbrock with a=1, b=100; global minimum at (1, 1)."""
    x = params[..., 0]
    y = params[..., 1]
    return jnp.square(1.0 - x) + 100.0 * jnp.square(y - jnp.square(x))


def rastrigin_function(x):
    """Many local minima; global minimum 0 at origin."""
    a = 10.0
    n = x.shape[-1]
    return a * n + jnp.sum(
        jnp.square(x) - a * jnp.cos(2.0 * jnp.pi * x), axis=-1
    )


def beale_function(params):
    """Beale; global minimum at (3, 0.5)."""
    x = params[..., 0]
    y = params[..., 1]
    return (
        jnp.square(1.5 - x + x * y)
        + jnp.square(2.25 - x + x * y**2)
        + jnp.square(2.625 - x + x * y**3)
    )


def bukin_function_6(params):
    """Bukin N.6; global minimum at (-10, 1); non-smooth."""
    x = params[..., 0]
    y = params[..., 1]
    return 100.0 * jnp.sqrt(jnp.abs(y - 0.01 * jnp.square(x))) + 0.01 * jnp.abs(
        x + 10.0
    )


def easom_function(params):
    """Easom; global minimum -1 at (pi, pi), nearly flat elsewhere."""
    x = params[..., 0]
    y = params[..., 1]
    return (
        -jnp.cos(x)
        * jnp.cos(y)
        * jnp.exp(-jnp.square(x - jnp.pi) - jnp.square(y - jnp.pi))
    )
