"""Recurrent cells for DIEN: GRU, AGRU, AUGRU as `jax.lax.scan` loops.

The reference forks 1,454 lines of TF's rnn.py solely to thread per-step
attention scores into custom GRU cells (reference DIEN/rnn.py:443,755-756).
In JAX the whole mechanism is ~30 lines: attention scores are just another
scanned input.

Cell equations (reference custom_grucell.py):
  GRU   : r,u = sigmoid(W [x, h] + b1);  c = tanh(W' [x, r*h] + b');
          h' = u*h + (1-u)*c
  AGRU  : h' = (1 - a) * h + a * c                      (line ~90)
  AUGRU : u <- (1 - a) * u;  h' = u*h + (1-u)*c          (lines 165-166)
with gate bias initialised to 1.0 (custom_grucell.py bias_ones) — reproduced.

Length masking matches tf.nn.dynamic_rnn(sequence_length=...): steps at or
beyond a row's length emit zero output and carry the state through unchanged.

TPU note: `lax.scan` over T=50 with (B, 2H) matmuls per step is the honest
structure of this computation; the input projections (x W) for all steps are
hoisted out of the scan into one big (B*T, in) x (in, 3H) MXU matmul, leaving
only the recurrent h-projections sequential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.ops.mlp import glorot_uniform

# Recurrent matmuls are small (B x H with H <= 64) but their rounding error
# compounds over T steps, so accumulate in full f32.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class GRULoop(nn.Module):
    """Runs a (A)(U)GRU over a padded sequence.

    Attributes:
      num_units: hidden width H.
      cell_type: 'GRU', 'AGRU' or 'AUGRU'.
    """

    num_units: int
    cell_type: str = "GRU"

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,              # (B, T, I)
        lengths: jax.Array,             # (B,)
        att_scores: jax.Array | None = None,  # (B, T) for AGRU/AUGRU
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (outputs (B, T, H), final_state (B, H))."""
        b, t, in_dim = inputs.shape
        h = self.num_units
        if self.cell_type in ("AGRU", "AUGRU") and att_scores is None:
            raise ValueError(f"{self.cell_type} requires att_scores")

        # Input-to-hidden weights for gates (2H) and candidate (H); biases:
        # gates init 1.0 (reference bias_ones), candidate init 0.
        w_xg = self.param("w_x_gates", glorot_uniform, (in_dim, 2 * h))
        w_hg = self.param("w_h_gates", glorot_uniform, (h, 2 * h))
        b_g = self.param("b_gates", nn.initializers.ones, (2 * h,))
        w_xc = self.param("w_x_cand", glorot_uniform, (in_dim, h))
        w_hc = self.param("w_h_cand", glorot_uniform, (h, h))
        b_c = self.param("b_cand", nn.initializers.zeros, (h,))

        # Hoist all input projections out of the scan: one MXU matmul each.
        xg_all = _mm(inputs.reshape(b * t, in_dim), w_xg)  # (B*T, 2H)
        xc_all = _mm(inputs.reshape(b * t, in_dim), w_xc)  # (B*T, H)
        xg_all = xg_all.reshape(b, t, 2 * h).transpose(1, 0, 2)  # (T, B, 2H)
        xc_all = xc_all.reshape(b, t, h).transpose(1, 0, 2)      # (T, B, H)

        step_mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
            inputs.dtype
        )  # (T, B)
        if att_scores is None:
            att_t = jnp.zeros((t, b), inputs.dtype)
        else:
            att_t = att_scores.astype(inputs.dtype).transpose(1, 0)  # (T, B)

        cell_type = self.cell_type

        def step(state, scanned):
            xg, xc, a, m = scanned
            gates = jax.nn.sigmoid(xg + _mm(state, w_hg) + b_g)
            r, u = jnp.split(gates, 2, axis=-1)
            c = jnp.tanh(xc + _mm(r * state, w_hc) + b_c)
            a = a[:, None]
            if cell_type == "GRU":
                new_h = u * state + (1.0 - u) * c
            elif cell_type == "AGRU":
                new_h = (1.0 - a) * state + a * c
            elif cell_type == "AUGRU":
                u = (1.0 - a) * u
                new_h = u * state + (1.0 - u) * c
            else:
                raise ValueError(f"unknown cell_type {cell_type!r}")
            m = m[:, None]
            new_state = m * new_h + (1.0 - m) * state  # carry through past length
            out = m * new_h                             # zero output past length
            return new_state, out

        init = jnp.zeros((b, h), inputs.dtype)
        final_state, outputs = jax.lax.scan(
            step, init, (xg_all, xc_all, att_t, step_mask)
        )
        return outputs.transpose(1, 0, 2), final_state
