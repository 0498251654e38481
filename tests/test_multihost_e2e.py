"""True multi-process training test: 2 processes x 4 CPU devices each.

The reference has no distributed story at all (SURVEY.md §2.4); this
validates ours end-to-end: `jax.distributed.initialize` over a local
coordinator, an 8-device global mesh, per-host input shards assembled with
`multihost.global_batch`, and a sharded Trainer step — asserting both
processes converge to the SAME loss as a single-process 8-device run on the
identical global batch stream.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
import jax.numpy as jnp
from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
from recalgorithm_tpu.parallel import mesh as mesh_lib, multihost
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.003))
schema = wechat_schema(gen.vocab_sizes())
cfg = DeepCrossingConfig(batch_size=64, train_steps=4)
model = DeepCrossing(config=cfg, schema=schema)
mesh = mesh_lib.make_mesh(num_model=1)
trainer = Trainer(model, cfg.task_names, optimizers.build("adam", 0.01),
                  TrainerConfig(model_dir=f"/tmp/mh_{pid}", save_checkpoints_steps=0,
                                rng_impl="threefry2x32"),
                  mesh=mesh)
B = 64
state = trainer.init_state(gen.batch(B, 0))
trainer._compile()
rng = jax.random.key(123, impl="threefry2x32")
loss = None
for i in range(4):
    full = gen.batch(B, i)                       # same global stream everywhere
    lo, hi = multihost.host_shard_range(B)
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = multihost.global_batch(local, mesh, B)
    rng, sub = jax.random.split(rng)
    state, loss = trainer._train_jit(state, batch, sub)
print("FINAL_LOSS", float(loss))

# multi-host-safe best export: every process enters the collective gather,
# process 0 writes the full (unsharded) artifact
import shutil
from recalgorithm_tpu.train.loop import _Checkpointer
export_root = "/tmp/mh_export_test"
if pid == 0 and os.path.isdir(export_root):
    shutil.rmtree(export_root, ignore_errors=True)
ck = _Checkpointer(export_root, keep_best=1)
ck.maybe_export_best(state, auc=0.9)
# repeated exports with a FULL best list: the early-return decision must be
# identical on every process (a divergent skip of the collective gather
# deadlocks the job — regression for the round-2 bookkeeping fix)
state = state.replace(step=state.step + 1)
ck.maybe_export_best(state, auc=0.5)   # worse: all processes skip
state = state.replace(step=state.step + 1)
ck.maybe_export_best(state, auc=0.95)  # better: all processes gather + evict
if pid == 0:
    import flax
    blob = open(os.path.join(export_root, "export",
                             f"best_{int(state.step)}", "params.msgpack"), "rb").read()
    tree = flax.serialization.msgpack_restore(blob)
    import numpy as _np
    leaves = jax.tree.leaves(tree["params"])
    assert all(isinstance(_np.asarray(l), _np.ndarray) for l in leaves)
    # full-shape check: the feedid table is whole, not a shard
    emb = tree["params"]["FieldEmbedder_0"]["embed"]["feedid"]
    print("EXPORT_ROWS", _np.asarray(emb).shape[0])

# StableHLO export under multi-process (the cli/main --export_stablehlo
# pattern): the host gather is a COLLECTIVE — every process must enter it,
# only process 0 writes.  Regression for the round-3 review finding where
# the gather sat inside the process-0 guard and deadlocked.
from recalgorithm_tpu.train.loop import _gather_to_host
from recalgorithm_tpu.serving.export import export_stablehlo
variables = _gather_to_host({"params": state.params,
                             "batch_stats": state.batch_stats})
if pid == 0:
    hlo_path = os.path.join(export_root, "model.stablehlo")
    export_stablehlo(model, variables, schema, batch_size=8, out_path=hlo_path)
    print("HLO_BYTES", os.path.getsize(hlo_path))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_loss() -> float:
    """Same 4 steps on a single-process 8-device mesh."""
    code = _WORKER.replace(
        'jax.distributed.initialize(\n    coordinator_address=f"127.0.0.1:{port}",'
        " num_processes=nproc, process_id=pid\n)", "",
    ).replace("assert jax.process_count() == nproc, jax.process_count()", "")
    code = code.replace(
        "assert len(jax.devices()) == 4 * nproc, len(jax.devices())",
        "assert len(jax.devices()) == 8, len(jax.devices())",
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code, "0", "2", "0"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # assertion on device count: 4*nproc == 8 holds for the 8-device run too
    return float(out.stdout.strip().split("FINAL_LOSS")[-1].split()[0])


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr[-2000:]
        outs.append(stdout)
    losses = [float(o.strip().split("FINAL_LOSS")[-1].split()[0]) for o in outs]
    # both processes hold the same global state
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # process 0 wrote a full (unsharded) serving artifact during the run
    proc0 = outs[0]
    assert "EXPORT_ROWS" in proc0, proc0[-500:]
    rows = int(proc0.strip().split("EXPORT_ROWS")[-1].split()[0])
    # exactly the whole ROW_ALIGN-padded feedid table (vocab_scale 0.003 ->
    # 319 ids -> 512 padded rows): not a shard (64), not doubled (1024)
    assert rows == 512, rows
    # the 2-process StableHLO export completed without deadlock and wrote
    # a non-empty artifact
    assert "HLO_BYTES" in proc0, proc0[-500:]
    assert int(proc0.strip().split("HLO_BYTES")[-1].split()[0]) > 10_000
    # and match a single-process 8-device run on the same stream
    np.testing.assert_allclose(losses[0], _single_process_loss(), rtol=1e-4)


_COMPACT_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
from recalgorithm_tpu.features.schema import wechat_schema
from recalgorithm_tpu.models.deep_crossing import DeepCrossing, DeepCrossingConfig
from recalgorithm_tpu.ops import compact_scatter as cs
from recalgorithm_tpu.parallel import mesh as mesh_lib, multihost
from recalgorithm_tpu.train import optimizers
from recalgorithm_tpu.train.loop import Trainer, TrainerConfig

cs.MIN_IDS = 0  # tiny batches must still engage the compact machinery
gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=5, vocab_scale=0.003))
schema = wechat_schema(gen.vocab_sizes())
cfg = DeepCrossingConfig(batch_size=32, train_steps=4)
mesh = mesh_lib.make_mesh(num_model=1)

B = 32
def local_batch(i):
    full = gen.batch(B, i)
    lo, hi = multihost.host_shard_range(B)
    local = {k: v[lo:hi] for k, v in full.items()}
    if pid == 1 and i == 1:
        # host 1's shard of batch 1 is DENSE (overflows the compact buffer)
        # while host 0's stays sparse: the dispatch agreement must route
        # BOTH hosts to the plain step or the job deadlocks
        for f in schema.sequence:
            t = f.max_length
            local[f.name] = np.ones((hi - lo, t), np.int32)
            local[f.name + "_len"] = np.full((hi - lo,), t, np.int32)
    return local

def run(compact: bool):
    model = DeepCrossing(config=cfg, schema=schema)
    tr = Trainer(model, cfg.task_names, optimizers.build("adam", 1e-2),
                 TrainerConfig(model_dir=f"/tmp/mh_compact_{pid}_{compact}",
                               save_checkpoints_steps=0,
                               compact_grad_scatter=compact,
                               rng_impl="threefry2x32"),
                 mesh=mesh)
    state = tr.init_state(gen.batch(B, 0))
    tr._compile()
    chosen = []
    it = tr._dispatch_steps((local_batch(i) for i in range(4)), window=2)
    loss = None
    for step, (hb, fn) in enumerate(it):
        if compact:
            chosen.append("C" if fn is tr._train_jit else "P")
        batch = tr._put_batch(hb)
        state, loss = fn(state, batch, jax.random.fold_in(
            jax.random.key(123, impl="threefry2x32"), step))
    return float(loss), "".join(chosen)

loss_c, pattern = run(True)
loss_p, _ = run(False)
print("PATTERN", pattern)
print("LOSSES", loss_c, loss_p)
assert abs(loss_c - loss_p) < 1e-5, (loss_c, loss_p)
"""


@pytest.mark.slow
def test_two_process_compact_dispatch_agreement(tmp_path):
    """Compact scatter under multi-process: host 1 makes one batch shard
    dense while host 0's stays sparse — the windowed collective agreement
    must route both hosts to the plain executable for that batch (pattern
    CPCC on BOTH), and the compact run's loss must equal the plain run's."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _COMPACT_WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, stderr[-3000:]
        outs.append(stdout)
    patterns = [o.strip().split("PATTERN")[-1].split()[0] for o in outs]
    assert patterns[0] == patterns[1] == "CPCC", patterns
    losses = [
        tuple(map(float, o.strip().split("LOSSES")[-1].split()[:2]))
        for o in outs
    ]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
