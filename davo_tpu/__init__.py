"""davo_tpu — a TPU-native visual-odometry / SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``jskinn/deep-attention-visual-odometry``: differentiable camera models with
analytic batched Jacobians, batched BFGS with strong-Wolfe line search run
inside the forward pass, learned initial-guess networks, attention feature
matching, on-device synthetic data, and multi-chip distributed bundle
adjustment over ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"
