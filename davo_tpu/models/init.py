"""Weight-initialisation helpers.

Feature parity target: ``networks/weights/init_weights_kaiming_normal.py``
in the reference (Kaiming init applied by module-type filter).  In flax the
same effect is achieved by passing initialisers to the modules.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["kaiming_normal_init", "kaiming_uniform_init", "dense_kaiming"]

kaiming_normal_init = nn.initializers.he_normal()
kaiming_uniform_init = nn.initializers.he_uniform()


def dense_kaiming(features: int, *, uniform: bool = False, name=None) -> nn.Dense:
    """A Dense layer with Kaiming (He) weight init and zero bias."""
    return nn.Dense(
        features,
        kernel_init=kaiming_uniform_init if uniform else kaiming_normal_init,
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )
