"""Sigma-scaled sigmoids.

The reference defines custom autograd ops (Vanilla_Sigmoid / Robust_Sigmoid,
reference ptranking/base/utils.py:18-95) purely to (a) scale by sigma and
(b) avoid exp overflow. `jax.nn.sigmoid` is already overflow-safe and its VJP
is exactly sigma * s * (1 - s) under the chain rule, so both reduce to a plain
stable sigmoid here — XLA fuses the scale into the surrounding expression.
"""

import jax
import jax.numpy as jnp


def robust_sigmoid(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Overflow-safe sigmoid(sigma * x) (reference Robust_Sigmoid, utils.py:57-95)."""
    return jax.nn.sigmoid(sigma * x)


def vanilla_sigmoid(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """sigmoid(sigma * x) (reference Vanilla_Sigmoid, utils.py:18-52)."""
    return jax.nn.sigmoid(sigma * x)
