"""Model-zoo smoke tests: every registered model inits, runs forward (train
and inference modes), produces finite per-task logits of the right shape, and
takes a finite gradient step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models import MODEL_REGISTRY

B = 16

_gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=11, vocab_scale=0.002))
SCHEMA = wechat_schema(_gen.vocab_sizes())
BATCH = {k: jnp.asarray(v) for k, v in _gen.batch(B, 0).items()}

# shrink the heavyweight hyperparameters so the suite runs on 1 CPU core
_SMALL_OVERRIDES = {
    "hidden_units": (32, 16),
    "expert_hidden_units": 16,
    "output_dimension": 8,
    "cin_layer_feature_maps": (8, 8),
    "attention_factor": 8,
    "cross_hash_buckets": 1000,
}


def _make(name):
    cfg_cls, model_cls = MODEL_REGISTRY[name]
    fields = {f.name for f in cfg_cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in _SMALL_OVERRIDES.items() if k in fields}
    cfg = cfg_cls(**kwargs)
    return cfg, model_cls(config=cfg, schema=SCHEMA)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_and_grad(name):
    cfg, model = _make(name)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        BATCH,
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # inference mode
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        BATCH, train=False, mutable=["losses"],
    )
    tasks = tuple(cfg.task_names) or ("read_comment",)
    assert set(logits) == set(tasks)
    for t, v in logits.items():
        assert v.shape == (B,), (name, t, v.shape)
        assert np.all(np.isfinite(np.asarray(v))), (name, t)

    # one train-mode grad step
    def loss_fn(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": batch_stats},
            BATCH, train=True,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats", "losses"],
        )
        total = sum(
            jnp.mean(optax.sigmoid_binary_cross_entropy(out[t], BATCH["labels"][:, 0]))
            for t in tasks
        )
        for leaf in jax.tree.leaves(upd.get("losses", {})):
            total = total + jnp.sum(leaf)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)), name
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0, name


def test_registry_complete():
    expected = {
        "WideAndDeep", "DeepFM", "FFM", "FwFM", "AFM", "NFM", "PNN",
        "DeepCrossing", "DCN", "xDeepFM", "FiBiNET", "DIN", "DIEN", "BST",
        "MMOE", "PLE", "ESMM",
    }
    assert expected <= set(MODEL_REGISTRY)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_bf16_precision_close_to_f32(name):
    """precision='bf16' runs every model and stays close to the f32 logits:
    params are f32, so inference with the same params must agree to bf16
    rounding of the tower matmuls."""
    cfg_cls, model_cls = MODEL_REGISTRY[name]
    fields = {f.name for f in cfg_cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in _SMALL_OVERRIDES.items() if k in fields}
    cfg32 = cfg_cls(**kwargs)
    cfg16 = cfg_cls(**kwargs, precision="bf16")
    m32 = model_cls(config=cfg32, schema=SCHEMA)
    m16 = model_cls(config=cfg16, schema=SCHEMA)
    variables = m32.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, BATCH,
        train=True,
    )
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    out32, _ = m32.apply(v, BATCH, train=False, mutable=["losses"])
    out16, _ = m16.apply(v, BATCH, train=False, mutable=["losses"])
    for t in cfg32.task_names:
        a, b = np.asarray(out32[t]), np.asarray(out16[t])
        assert b.dtype == np.float32, (name, t, b.dtype)
        assert np.all(np.isfinite(b)), (name, t)
        # bf16 rounding error is relative to the *scale* of the pre-activation
        # sums (cancellation can make per-element relative error unbounded);
        # 1% of the logit range is well under a sigmoid's resolution there.
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, b, rtol=0, atol=0.01 * scale, err_msg=(name, t)
        )


def test_masknet_serial_and_finalmlp_static_context():
    """Non-default variants: MaskNet-S (serial block chaining) and
    FinalMLP with empty feature-selection groups (learned static context)
    run forward and produce finite logits."""
    from recalgorithm_tpu.models.masknet import MaskNet, MaskNetConfig
    from recalgorithm_tpu.models.final_mlp import FinalMLP, FinalMLPConfig

    for cfg, cls in [
        (MaskNetConfig(block_mode="serial", num_blocks=2,
                       hidden_units=(32, 16)), MaskNet),
        (FinalMLPConfig(fs1_fields=(), fs2_fields=(),
                        hidden_units=(32, 16)), FinalMLP),
    ]:
        model = cls(config=cfg, schema=SCHEMA)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            BATCH, train=True,
        )
        logits, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            BATCH, train=False, mutable=["losses"],
        )
        v = np.asarray(logits["read_comment"])
        assert v.shape == (B,) and np.all(np.isfinite(v)), cls.__name__
