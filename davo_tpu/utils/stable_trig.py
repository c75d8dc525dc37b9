"""Numerically-stable trigonometric ratio primitives.

These are the four ``sinc``-family ratios that appear in Rodrigues' rotation
formula and its derivatives.  Each has a removable singularity at ``x = 0``
that a naive implementation turns into ``0/0``; we switch to a truncated
Taylor series below a threshold and install a :func:`jax.custom_jvp` rule so
derivatives (to arbitrary order) are likewise NaN-free.

The derivative of each ratio is expressible in terms of the others:

* ``d/dx [sin x / x]              =  x * (cos x / x^2 - sin x / x^3)``
* ``d/dx [(1 - cos x) / x^2]      =  x * (sin x / x^3 - 2 (1 - cos x) / x^4)``
* ``d/dx [cos x/x^2 - sin x/x^3]  = -(sin x / x + 3 (cos x/x^2 - sin x/x^3)) / x``
* ``d/dx [sin x/x^3 - 2(1-cos)/x^4] = ((cos x/x^2 - sin x/x^3) - 4 (sin x/x^3 - 2(1-cos)/x^4)) / x``

so the whole family closes under differentiation.  Feature parity target:
the reference repo's custom autograd functions in
``deep_attention_visual_odometry/utils/func_sin_x_on_x.py``,
``func_one_minus_cos_x_on_x_squared.py`` and
``func_sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sin_x_on_x",
    "one_minus_cos_x_on_x_squared",
    "cos_x_on_x_squared_minus_sin_x_on_x_cubed",
    "sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth",
    "sinc_sq",
    "one_minus_cos_sq",
    "cos_sin_sq",
    "sin_cubed_sq",
    "cos_from_sq",
]

# Switch thresholds.  With the series truncated at x^6 the truncation error at
# the threshold is at or below float64 machine epsilon, so both branches agree
# to full precision where they meet (no gradcheck cliff at the switch).
_SMALL = 0.05
_SMALL_F3 = 0.25


def _safe(x, small):
    """Replace |x| < threshold entries by 1 so the exact branch never divides
    by ~0.  The double-``where`` pattern: the exact branch is only *selected*
    where it is finite, and the substitution keeps its (unused) gradient
    finite as well."""
    return jnp.where(small, jnp.ones_like(x), x)


@jax.custom_jvp
def sin_x_on_x(x):
    """``sin(x) / x`` with a removable singularity at 0 (== 1)."""
    small = jnp.abs(x) < _SMALL
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = 1.0 + x2 * (-1.0 / 6.0 + x2 * (1.0 / 120.0 + x2 * (-1.0 / 5040.0)))
    return jnp.where(small, taylor, jnp.sin(xs) / xs)


@jax.custom_jvp
def cos_x_on_x_squared_minus_sin_x_on_x_cubed(x):
    """``cos(x)/x^2 - sin(x)/x^3``; tends to -1/3 at 0.

    This is ``(1/x) d/dx [sin(x)/x]``.
    """
    small = jnp.abs(x) < _SMALL
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = -1.0 / 3.0 + x2 * (1.0 / 30.0 + x2 * (-1.0 / 840.0 + x2 * (1.0 / 45360.0)))
    exact = (jnp.cos(xs) - jnp.sin(xs) / xs) / jnp.square(xs)
    return jnp.where(small, taylor, exact)


@jax.custom_jvp
def one_minus_cos_x_on_x_squared(x):
    """``(1 - cos(x)) / x^2``; tends to 1/2 at 0."""
    small = jnp.abs(x) < _SMALL
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = 0.5 + x2 * (-1.0 / 24.0 + x2 * (1.0 / 720.0 + x2 * (-1.0 / 40320.0)))
    # 2 sin^2(x/2) / x^2 is stabler than (1 - cos x)/x^2 for moderate x.
    half = 0.5 * xs
    exact = 2.0 * jnp.square(jnp.sin(half)) / jnp.square(xs)
    return jnp.where(small, taylor, exact)


@jax.custom_jvp
def sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x):
    """``sin(x)/x^3 - 2 (1 - cos(x))/x^4``; tends to -1/12 at 0.

    This is ``(1/x) d/dx [(1 - cos x)/x^2]``.
    """
    small = jnp.abs(x) < _SMALL_F3
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = -1.0 / 12.0 + x2 * (
        1.0 / 180.0 + x2 * (-1.0 / 6720.0 + x2 * (1.0 / 453600.0))
    )
    x2s = jnp.square(xs)
    half = 0.5 * xs
    exact = (jnp.sin(xs) / xs - 4.0 * jnp.square(jnp.sin(half)) / x2s) / x2s
    return jnp.where(small, taylor, exact)


def _d_cos_x_on_x_squared_minus_sin_x_on_x_cubed(x):
    small = jnp.abs(x) < _SMALL
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = x * (1.0 / 15.0 + x2 * (-1.0 / 210.0 + x2 * (1.0 / 7560.0)))
    exact = (
        -(sin_x_on_x(xs) + 3.0 * cos_x_on_x_squared_minus_sin_x_on_x_cubed(xs)) / xs
    )
    return jnp.where(small, taylor, exact)


def _d_sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x):
    small = jnp.abs(x) < _SMALL_F3
    xs = _safe(x, small)
    x2 = jnp.square(x)
    taylor = x * (1.0 / 90.0 + x2 * (-1.0 / 1680.0 + x2 * (1.0 / 75600.0)))
    exact = (
        cos_x_on_x_squared_minus_sin_x_on_x_cubed(xs)
        - 4.0 * sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(xs)
    ) / xs
    return jnp.where(small, taylor, exact)


# ---------------------------------------------------------------------------
# Squared-argument variants.
#
# All four ratios are even functions of x, hence analytic in s = x^2.  The
# geometry layer computes s = |w|^2 directly (no sqrt), which removes the
# |w| -> 0 non-differentiability of the norm: every rotation quantity becomes
# a smooth function of the so(3) vector, NaN-free in gradients of any order.
#
# Derivative chains in s (using d/ds = (1/2x) d/dx):
#   d sinc_sq/ds        = cos_sin_sq / 2
#   d one_minus_cos_sq/ds = sin_cubed_sq / 2
#   d cos_sin_sq/ds     = -(sinc_sq + 3 cos_sin_sq) / (2 s)      [removable]
#   d sin_cubed_sq/ds   = (cos_sin_sq - 4 sin_cubed_sq) / (2 s)  [removable]
# ---------------------------------------------------------------------------

_SMALL_SQ = _SMALL * _SMALL
_SMALL_SQ_F3 = _SMALL_F3 * _SMALL_F3


def _sqrt_safe(s, small):
    return jnp.sqrt(jnp.where(small, jnp.ones_like(s), s))


@jax.custom_jvp
def sinc_sq(s):
    """``sin(sqrt(s)) / sqrt(s)`` as a smooth function of ``s = x^2 >= 0``."""
    small = s < _SMALL_SQ
    x = _sqrt_safe(s, small)
    taylor = 1.0 + s * (-1.0 / 6.0 + s * (1.0 / 120.0 + s * (-1.0 / 5040.0)))
    return jnp.where(small, taylor, jnp.sin(x) / x)


@jax.custom_jvp
def cos_sin_sq(s):
    """``cos(x)/x^2 - sin(x)/x^3`` with ``x = sqrt(s)``."""
    small = s < _SMALL_SQ
    x = _sqrt_safe(s, small)
    taylor = -1.0 / 3.0 + s * (1.0 / 30.0 + s * (-1.0 / 840.0 + s * (1.0 / 45360.0)))
    exact = (jnp.cos(x) - jnp.sin(x) / x) / jnp.where(small, 1.0, s)
    return jnp.where(small, taylor, exact)


@jax.custom_jvp
def one_minus_cos_sq(s):
    """``(1 - cos(x)) / x^2`` with ``x = sqrt(s)``."""
    small = s < _SMALL_SQ
    x = _sqrt_safe(s, small)
    taylor = 0.5 + s * (-1.0 / 24.0 + s * (1.0 / 720.0 + s * (-1.0 / 40320.0)))
    exact = 2.0 * jnp.square(jnp.sin(0.5 * x)) / jnp.where(small, 1.0, s)
    return jnp.where(small, taylor, exact)


@jax.custom_jvp
def sin_cubed_sq(s):
    """``sin(x)/x^3 - 2 (1 - cos(x))/x^4`` with ``x = sqrt(s)``."""
    small = s < _SMALL_SQ_F3
    x = _sqrt_safe(s, small)
    ss = jnp.where(small, 1.0, s)
    taylor = -1.0 / 12.0 + s * (
        1.0 / 180.0 + s * (-1.0 / 6720.0 + s * (1.0 / 453600.0))
    )
    exact = (jnp.sin(x) / x - 4.0 * jnp.square(jnp.sin(0.5 * x)) / ss) / ss
    return jnp.where(small, taylor, exact)


def cos_from_sq(s):
    """``cos(sqrt(s))`` as a smooth function of ``s``: ``1 - s * (1-cos)/x^2``."""
    return 1.0 - s * one_minus_cos_sq(s)


def _d_cos_sin_sq(s):
    small = s < _SMALL_SQ
    ss = jnp.where(small, 1.0, s)
    taylor = 1.0 / 30.0 + s * (-1.0 / 420.0 + s * (1.0 / 15120.0))
    exact = -(sinc_sq(ss) + 3.0 * cos_sin_sq(ss)) / (2.0 * ss)
    return jnp.where(small, taylor, exact)


def _d_sin_cubed_sq(s):
    small = s < _SMALL_SQ_F3
    ss = jnp.where(small, 1.0, s)
    taylor = 1.0 / 180.0 + s * (-1.0 / 3360.0 + s * (1.0 / 151200.0))
    exact = (cos_sin_sq(ss) - 4.0 * sin_cubed_sq(ss)) / (2.0 * ss)
    return jnp.where(small, taylor, exact)


@sinc_sq.defjvp
def _sinc_sq_jvp(primals, tangents):
    (s,) = primals
    (t,) = tangents
    return sinc_sq(s), t * 0.5 * cos_sin_sq(s)


@cos_sin_sq.defjvp
def _cos_sin_sq_jvp(primals, tangents):
    (s,) = primals
    (t,) = tangents
    return cos_sin_sq(s), t * _d_cos_sin_sq(s)


@one_minus_cos_sq.defjvp
def _one_minus_cos_sq_jvp(primals, tangents):
    (s,) = primals
    (t,) = tangents
    return one_minus_cos_sq(s), t * 0.5 * sin_cubed_sq(s)


@sin_cubed_sq.defjvp
def _sin_cubed_sq_jvp(primals, tangents):
    (s,) = primals
    (t,) = tangents
    return sin_cubed_sq(s), t * _d_sin_cubed_sq(s)


@sin_x_on_x.defjvp
def _sin_x_on_x_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return sin_x_on_x(x), t * x * cos_x_on_x_squared_minus_sin_x_on_x_cubed(x)


@cos_x_on_x_squared_minus_sin_x_on_x_cubed.defjvp
def _cos_sin_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return (
        cos_x_on_x_squared_minus_sin_x_on_x_cubed(x),
        t * _d_cos_x_on_x_squared_minus_sin_x_on_x_cubed(x),
    )


@one_minus_cos_x_on_x_squared.defjvp
def _one_minus_cos_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return (
        one_minus_cos_x_on_x_squared(x),
        t * x * sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x),
    )


@sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth.defjvp
def _sin_cubed_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return (
        sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x),
        t * _d_sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x),
    )
