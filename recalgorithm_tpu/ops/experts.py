"""Multi-task expert mixing: MMOE gates/experts, task towers, PLE extraction.

TPU-first restructuring of the reference's per-expert Python loops
(mmoe.py:208-224, extraction_network.py:27-85): all experts of a group are a
single stacked ``(E, in, H)`` weight tensor contracted with one einsum — one
large MXU matmul instead of E small ones — which also makes true expert
parallelism a sharding annotation: under a mesh, parallel/mesh.py shards the
E axis of every ExpertGroup param over the ``model`` axis (instance names
start with 'experts' by convention; equivalence tested in
tests/test_sharding.py::test_expert_parallelism_matches_single).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.ops.mlp import MLPTower, glorot_uniform


class ExpertGroup(nn.Module):
    """E parallel one-layer relu experts as a stacked einsum.

    (B, in) -> (B, E, H).  Matches mmoe.py:208-216 / the per-expert
    tf.layers.dense(relu) calls in extraction_network.py:27-46.

    ``weights(in_dim)`` exposes the (E, in, H) kernel and (E, H) bias
    without computing, so a parent layer can concatenate several groups'
    kernels into ONE stacked einsum (ExtractionNetwork does this: one
    (B, sumE, H) contraction instead of 4 small ones) while the param /
    checkpoint layout stays per-group.
    """

    num_experts: int
    hidden_units: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def weights(self, in_dim: int) -> tuple[jax.Array, jax.Array]:
        w = self.param(
            "kernel", glorot_uniform, (self.num_experts, in_dim, self.hidden_units)
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.num_experts, self.hidden_units)
        )
        return w, b

    def __call__(self, x: jax.Array) -> jax.Array:
        w, b = self.weights(x.shape[-1])
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            w = w.astype(self.compute_dtype)
        h = jnp.einsum("bi,eih->beh", x, w, preferred_element_type=jnp.float32)
        return nn.relu(h + b)


class SoftmaxGate(nn.Module):
    """Bias-free softmax gate over experts (mmoe.py:218-224, paper parity).

    Sows the batch-mean gate weights into the ``summaries`` collection —
    the reference's LoggingTensorHook prints gate softmax outputs per task
    every 100 steps (mmoe.py:294-309); the Trainer logs these per-expert
    means whenever the collection is mutable.
    """

    num_experts: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, in) -> (B, E)
        w = self.param("kernel", glorot_uniform, (x.shape[-1], self.num_experts))
        gate = jax.nn.softmax(x @ w, axis=-1)
        self.sow("summaries", "gate_mean", jnp.mean(gate, axis=0),
                 reduce_fn=lambda prev, new: new)
        return gate


def mix_experts(experts: jax.Array, gate: jax.Array) -> jax.Array:
    """(B, E, H), (B, E) -> (B, H) gate-weighted expert mixture."""
    return jnp.einsum("beh,be->bh", experts, gate)


class TaskTower(nn.Module):
    """Per-task head: MLP (relu, dropout, BN) -> 1 logit (tower_layer.py:4-28)."""

    hidden_units: Sequence[int]
    dropout_rate: float = 0.1
    batch_norm: bool = True
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return MLPTower(
            hidden_units=self.hidden_units,
            dropout_rate=self.dropout_rate,
            batch_norm=self.batch_norm,
            logits_dim=1,
            compute_dtype=self.compute_dtype,
        )(x, train)


class ExtractionNetwork(nn.Module):
    """PLE CGC block (reference extraction_network.py:4-85).

    Per task: gate over (task experts ++ shared experts); plus an extra
    all-experts gate.  Reference quirk reproduced: the per-task outputs and
    the all-experts output are **summed** into a single tensor
    (extraction_network.py:85's tf.add_n) rather than kept per-task as in the
    PLE paper.
    """

    task_names: Sequence[str]
    num_experts_per_task: Sequence[int]
    num_experts_in_shared: int
    expert_hidden_units: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, in) -> (B, H)
        # Because the reference SUMS every per-task mixture and the
        # all-experts mixture into one tensor (extraction_network.py:85),
        # the whole block is linear in the gate weights: run ALL experts as
        # ONE stacked (B, sumE, H) einsum (param/checkpoint layout stays
        # per-group via ExpertGroup.weights), accumulate each gate's
        # weights into per-expert-slot effective weights, and mix ONCE —
        # 4 expert einsums + 4 mixes collapse to 1 + 1 (round-2 verdict:
        # PLE's step was a long tail of small (B, E, 256) fusions).
        in_dim = x.shape[-1]
        groups = [
            ExpertGroup(n_task, self.expert_hidden_units,
                        compute_dtype=self.compute_dtype,
                        name=f"experts_{task}")
            for task, n_task in zip(self.task_names, self.num_experts_per_task)
        ] + [ExpertGroup(self.num_experts_in_shared, self.expert_hidden_units,
                         compute_dtype=self.compute_dtype,
                         name="experts_shared")]
        ws, bs = zip(*(g.weights(in_dim) for g in groups))
        w_all = jnp.concatenate(ws, axis=0)   # (sumE, in, H)
        b_all = jnp.concatenate(bs, axis=0)   # (sumE, H)
        xc = x if self.compute_dtype is None else x.astype(self.compute_dtype)
        wc = (w_all if self.compute_dtype is None
              else w_all.astype(self.compute_dtype))
        h = nn.relu(
            jnp.einsum("bi,eih->beh", xc, wc,
                       preferred_element_type=jnp.float32) + b_all
        )  # (B, sumE, H); slots = [task0.., task1.., task2.., shared..]

        n_tasks = len(self.task_names)
        es = self.num_experts_in_shared
        offs = [0]
        for n_task in self.num_experts_per_task:
            offs.append(offs[-1] + n_task)
        sum_e = offs[-1] + es

        # all-experts gate covers the slots in stacked order already
        w_eff = SoftmaxGate(sum_e, name="all_gate")(x)  # (B, sumE)
        for i, task in enumerate(self.task_names):
            et = self.num_experts_per_task[i]
            gate = SoftmaxGate(et + es, name=f"gate_{task}")(x)
            w_eff = w_eff.at[:, offs[i]:offs[i + 1]].add(gate[:, :et])
            w_eff = w_eff.at[:, offs[n_tasks]:].add(gate[:, et:])
        return mix_experts(h, w_eff)
