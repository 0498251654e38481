"""Dense towers with reference-parity layer ordering and initialisation.

The reference's deep parts all follow the same per-layer recipe
(wide_and_deep.py:216-221, tower_layer.py:19-25):

    dense(units, relu) -> dropout(rate, if training) -> batch_norm(training)

i.e. *post-activation* BN applied after dropout.  ``MLPTower`` reproduces
exactly that, with TF-default initialisers (glorot_uniform kernels, zero
biases) so learning dynamics match the reference.

Mixed precision: pass ``compute_dtype=jnp.bfloat16`` to run each matmul on
the MXU in bfloat16 (params stay float32, every matmul output is promoted
straight back to float32, so BN statistics / activations / the logit head all
keep full precision).  Selected per model via the ``precision`` train flag.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.ops.activations import Dice, PReLU

glorot_uniform = nn.initializers.glorot_uniform()


class Dense(nn.Dense):
    """nn.Dense with TF-default glorot_uniform kernel init.

    When ``dtype`` is set (e.g. bf16 for the MXU), params stay float32, the
    matmul runs in ``dtype``, and the output is promoted straight back to
    float32 — so everything around the matmul (BN statistics, activations,
    losses) keeps full precision and only the MXU-bound contraction is mixed.
    """

    kernel_init: nn.initializers.Initializer = glorot_uniform

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        out = super().__call__(inputs)
        if self.dtype is not None and out.dtype != jnp.float32:
            out = out.astype(jnp.float32)
        return out


class MLPTower(nn.Module):
    """Hidden stack: [dense-act -> dropout -> BN] * N (+ optional final logit).

    Attributes:
      hidden_units: width of each hidden layer.
      activation: 'relu' (default), 'dice' or 'prelu' (DIN, reference
        din.py:224-238), or any callable.
      dropout_rate: active only when 0 < rate < 1 and train=True
        (reference wide_and_deep.py:218-219).
      batch_norm: post-activation BN with running stats (UPDATE_OPS parity).
      logits_dim: if set, append a final linear layer of this width with no
        activation/dropout/BN (the reference's Dense(1) head).
    """

    hidden_units: Sequence[int]
    activation: str | Callable = "relu"
    dropout_rate: float = 0.0
    batch_norm: bool = False
    logits_dim: int | None = None
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, units in enumerate(self.hidden_units):
            x = Dense(units, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            if self.activation == "relu":
                x = nn.relu(x)
            elif self.activation == "dice":
                x = Dice(name=f"dice_{i}")(x, train)
            elif self.activation == "prelu":
                x = PReLU(name=f"prelu_{i}")(x)
            elif callable(self.activation):
                x = self.activation(x)
            else:
                raise ValueError(f"unknown activation {self.activation!r}")
            if 0.0 < self.dropout_rate < 1.0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,
                    name=f"bn_{i}",
                )(x)
        if self.logits_dim is not None:
            x = Dense(self.logits_dim, name="logits")(x)
        return x


class ResidualUnit(nn.Module):
    """DeepCrossing residual block (reference residual_unit.py:4-21).

    y = relu(x + Dense(relu(Dense(x, internal_dim)), dim(x))).
    """

    internal_dim: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_dim = x.shape[-1]
        h = Dense(self.internal_dim, dtype=self.compute_dtype, name="inner")(x)
        h = nn.relu(h)
        h = Dense(out_dim, dtype=self.compute_dtype, name="outer")(h)
        return nn.relu(x + h)
