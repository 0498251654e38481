"""Device mesh construction and sharding rules.

The canonical layout for CTR ranking models on a TPU slice:

  * mesh axes ``("data", "model")`` — ``data`` carries the batch (pure DP),
    ``model`` is reserved for expert/table-column parallelism (EP for
    MMOE/PLE, column sharding for very wide tables); at reference scale
    ``model=1`` is the default,
  * dense-tower parameters are replicated,
  * embedding tables are **row-sharded over the full mesh** (both axes
    flattened): tables dominate memory while their FLOPs are negligible, so
    spreading rows across every chip maximises HBM headroom and turns lookups
    into all-to-alls that ride ICI.  Under pjit the XLA SPMD partitioner
    inserts those collectives from the ``P(("data", "model"), None)``
    annotation alone; embed/sharded.py provides the hand-written shard_map
    variant.

The reference has no distribution whatsoever (SURVEY.md §2.4); this module is
where the new framework adds it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Row-sharded over every device; the embedding engine's lookups become
# all-to-alls on ICI.
TABLE_SPEC = P((DATA_AXIS, MODEL_AXIS), None)
BATCH_SPEC = P(DATA_AXIS)
REPLICATED = P()
# Expert parallelism: stacked (E, in, H) expert kernels shard their expert
# axis over ``model`` (ops/experts.py ExpertGroup) — each model-shard holds
# E/model experts, gate mixing psums across them (partitioner-derived).
EXPERT_KERNEL_SPEC = P(MODEL_AXIS, None, None)
EXPERT_BIAS_SPEC = P(MODEL_AXIS, None)


def make_mesh(
    num_model: int = 1, devices: list | None = None
) -> Mesh:
    """Mesh over all (or given) devices: (n/num_model, num_model) data x model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % num_model:
        raise ValueError(f"{n} devices not divisible by model={num_model}")
    arr = np.asarray(devices).reshape(n // num_model, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def is_embedding_table_path(path: tuple) -> bool:
    """True for params living under an EmbeddingCollection scope.

    Framework convention: every EmbeddingCollection instance name contains
    'embed' ('embed', 'embed_w', W&D's 'wide_embed_w') so sharding and
    quantization rules need no per-model configuration.  Substring, not
    prefix: W&D's wide-cross table (100k rows, the model's largest) must be
    row-sharded and quantizable like every other table.  Only SCOPE entries
    (path[:-1]) are tested — the leaf is the table's vocab name, and leaf
    params like BST's 'position_embedding' must not match.
    Accepts jax KeyPath entries (DictKey/GetAttrKey) or plain strings.
    """
    keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path[:-1]]
    return any("embed" in k for k in keys)


def is_expert_param_path(path) -> bool:
    """True for params of an ExpertGroup (framework convention: instance
    names start with 'experts' — MMOE's 'experts', PLE/CGC's
    'experts_<task>' / 'experts_shared')."""
    keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    return any(k.startswith("experts") for k in keys)


def _spec_for(path, leaf, num_model: int = 1):
    if is_embedding_table_path(path):
        return TABLE_SPEC
    if is_expert_param_path(path):
        # stacked expert kernels (E, in, H) / biases (E, H): true expert
        # parallelism over the model axis (SURVEY.md §2.4 item 4).  Only
        # when E divides the model axis — device_put rejects uneven
        # NamedShardings, and replication is what round-1 did anyway
        # (MMOE's default num_experts=3 on model=2 must keep working).
        shape = getattr(leaf, "shape", ())
        divisible = bool(shape) and num_model > 0 and shape[0] % num_model == 0
        if divisible:
            if getattr(leaf, "ndim", 0) == 3:
                return EXPERT_KERNEL_SPEC
            if getattr(leaf, "ndim", 0) == 2:
                return EXPERT_BIAS_SPEC
    return REPLICATED


def param_specs(params, num_model: int = 1) -> object:
    """PartitionSpec tree: embedding tables row-sharded, expert groups
    sharded over ``model`` (when the expert count divides the axis), the
    rest replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, num_model), params
    )


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params, num_model=mesh.shape.get(MODEL_AXIS, 1)),
        is_leaf=lambda x: isinstance(x, P),
    )
