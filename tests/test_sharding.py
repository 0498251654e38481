"""Multi-device tests on the faked 8-device CPU mesh (SURVEY.md §4c).

Asserts sharded-vs-single-device numerical equivalence of the pjit'd train
step with row-sharded embedding tables, and that the dryrun_multichip driver
hook executes.
"""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
from recalgorithm_tpu.parallel import mesh as mesh_lib
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _trainer(mesh, model_dir):
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.002))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DeepCrossingConfig(batch_size=32, train_steps=3)
    model = DeepCrossing(config=cfg, schema=schema)
    trainer = Trainer(
        model, cfg.task_names, optimizers.build("adam", 1e-2),
        TrainerConfig(model_dir=model_dir, train_steps=3, save_checkpoints_steps=0),
        mesh=mesh,
    )
    return trainer, gen


def test_sharded_matches_single_device(tmp_path):
    mesh = mesh_lib.make_mesh(num_model=2)
    results = {}
    for name, m in [("single", None), ("sharded", mesh)]:
        trainer, gen = _trainer(m, str(tmp_path / name))
        state = trainer.init_state(gen.batch(32, 0))
        trainer._compile()
        losses = []
        rng = jax.random.key(0)
        for i in range(3):
            batch = trainer._put_batch(gen.batch(32, i))
            rng, sub = jax.random.split(rng)
            state, loss = trainer._train_jit(state, batch, sub)
            losses.append(float(loss))
        results[name] = (losses, state)

    np.testing.assert_allclose(
        results["single"][0], results["sharded"][0], rtol=2e-3, atol=2e-3
    )
    # params equivalent after 3 steps
    single_p = jax.tree.leaves(results["single"][1].params)
    sharded_p = jax.tree.leaves(results["sharded"][1].params)
    for a, b in zip(single_p, sharded_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        )


def test_tables_actually_sharded(tmp_path):
    mesh = mesh_lib.make_mesh(num_model=1)
    trainer, gen = _trainer(mesh, str(tmp_path))
    state = trainer.init_state(gen.batch(32, 0))
    table = state.params["FieldEmbedder_0"]["embed"]["feedid"]
    # row-sharded over all 8 devices
    assert len(table.sharding.device_set) == 8
    shard_rows = {s.data.shape[0] for s in table.addressable_shards}
    assert all(r < table.shape[0] for r in shard_rows)
    # dense params replicated
    dense_kernel = jax.tree.leaves(state.params["res_0"])[0]
    assert dense_kernel.sharding.is_fully_replicated


def test_dryrun_multichip_hook():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
