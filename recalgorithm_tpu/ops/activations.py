"""Activation functions with reference parity (DIN dice/prelu, BST leakyrelu).

References: algorithm/DIN/activations.py:4-37, algorithm/BST/leakyrelu.py:4-16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def leakyrelu(x: jax.Array, leak: float = 0.01) -> jax.Array:
    """Abs-trick leaky ReLU (reference leakyrelu.py:14-16)."""
    f1 = 0.5 * (1 + leak)
    f2 = 0.5 * (1 - leak)
    return f1 * x + f2 * jnp.abs(x)


class PReLU(nn.Module):
    """PReLU with per-channel alpha initialised to 1.0 (reference activations.py:4-17).

    Alpha=1 at init makes it the identity on the negative half, matching the
    reference's unusual constant_initializer(1.0).
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        return jnp.maximum(0.0, x) + alpha * jnp.minimum(0.0, x)


class Dice(nn.Module):
    """DIN's Dice activation (reference activations.py:20-37).

    x_norm = BatchNorm(x, no scale/center); p = sigmoid(x_norm);
    out = x * p + alpha * x * (1 - p), with per-channel alpha init 1.0.
    Uses a running-stats BatchNorm (mutable 'batch_stats' collection) exactly
    like the reference's tf.layers.batch_normalization.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3  # TF batch_normalization default

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        x_norm = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=self.momentum,
            epsilon=self.epsilon,
        )(x)
        p = jax.nn.sigmoid(x_norm)
        return x * p + alpha * x * (1.0 - p)
