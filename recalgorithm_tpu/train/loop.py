"""Training driver: the TPU-native replacement for tf.estimator.train_and_evaluate.

Responsibilities (mirroring the reference's Estimator usage,
wide_and_deep.py:331-376, and SURVEY.md §3.1):

  * jitted/pjit'ed train step — loss = sum of per-task mean sigmoid CE
    (mmoe.py:261-263) + any regularisation terms models sow into the
    ``"losses"`` collection; BatchNorm running stats via the mutable
    ``batch_stats`` collection (UPDATE_OPS parity),
  * streaming train metrics (loss / accuracy / 200-bin AUC) logged every
    ``log_every`` steps (LoggingTensorHook parity),
  * periodic eval every ``eval_every_steps`` with streaming AUC + accuracy,
  * Orbax checkpointing every ``save_checkpoints_steps`` with
    resume-from-latest, plus a best-exporter keyed on eval AUC of the first
    task that keeps the ``keep_best`` best serving artifacts
    (BestExporter(exports_to_keep=5) parity),
  * multi-chip: given a Mesh, the batch is sharded over ``data`` and the
    embedding tables row-sharded over the whole mesh (parallel/mesh.py);
    the same step function runs single-chip when mesh is None.

Data contract: iterables of host batches (dict[str, np.ndarray]) with fixed
shapes; an optional ``"_weights"`` (B,) 0/1 mask marks real rows in padded
eval tails.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax
from flax import struct

from recalgorithm_tpu.parallel import mesh as mesh_lib
from recalgorithm_tpu.train import metrics as M


@struct.dataclass
class TaskMetrics:
    auc: M.AUCState
    acc: M.ScalarMeanState
    # production CTR diagnostics (beyond the reference's auc/accuracy):
    # per-task sigmoid cross-entropy and the calibration ratio
    # mean(prediction)/mean(label) — the first number a serving team checks
    # (a miscalibrated CTR feeds wrong expected-value bids downstream).
    logloss: M.ScalarMeanState
    pmean: M.ScalarMeanState
    ymean: M.ScalarMeanState

    @classmethod
    def init(cls):
        return cls(auc=M.AUCState.init(), acc=M.ScalarMeanState.init(),
                   logloss=M.ScalarMeanState.init(),
                   pmean=M.ScalarMeanState.init(),
                   ymean=M.ScalarMeanState.init())


@struct.dataclass
class TrainState:
    step: jax.Array
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    loss_mean: M.ScalarMeanState
    task_metrics: dict  # task -> TaskMetrics
    # last step's "summaries" collection (gate weights, kernel norms, ...);
    # logged every log_every steps (LoggingTensorHook / tf.summary parity)
    summaries: dict = struct.field(default_factory=dict)


@dataclasses.dataclass
class TrainerConfig:
    model_dir: str = "./model_dir"
    train_steps: int = 10000
    log_every: int = 100
    eval_every_steps: int = 0  # 0 = no step-triggered eval
    # time-based eval throttle, the reference's EvalSpec(throttle_secs=600)
    # (wide_and_deep.py:350-355): evaluate when at least this many seconds
    # have passed since the last eval. 0 disables (final eval always runs).
    eval_throttle_secs: float = 0.0
    save_checkpoints_steps: int = 1000
    keep_best: int = 5  # BestExporter(exports_to_keep=5)
    seed: int = 42
    # fuse coordinate-wise optimizers into one flat-buffer update via
    # optax.flatten. Honest on-device timing (utils/benchmarking.py) shows
    # per-leaf updates are already fast on TPU (~20us for 2.5M params) while
    # the ravel/unravel relayout costs ~1.5ms, so fusion stays OFF; the knob
    # exists for leaf-heavy models on dispatch-bound backends.
    fuse_optimizer: bool = False
    # Route embedding lookups through the hand-written shard_map exchange
    # (embed/sharded.py: all_gather ids -> local gather -> psum_scatter)
    # instead of partitioner-derived collectives.  Requires a mesh;
    # numerically identical to the auto path (tests/test_sharding.py).
    shard_map_embeddings: bool = False
    # PAD-compacted sequence-gradient scatter (ops/compact_scatter.py): the
    # backward of every (B, T) sequence gather compacts the valid-prefix
    # entries to a static cap and scatters only those — WeChat 7-day
    # sequences are ~85-90% PAD and the XLA scatter pays per entry (DIN
    # 790k -> 863k ex/s measured, docs/ROADMAP.md round 3).  Exactness at
    # every density comes from HOST-side dispatch: batches whose *_len
    # sums overflow the compact buffer run a separately-compiled
    # plain-scatter step (an in-graph cond would stall the pipeline ~1 ms
    # on the data-dependent predicate).  Pure XLA (no Mosaic).  Composes
    # with a single-process mesh (the SPMD partitioner shards the compact
    # bookkeeping like any other op; tests/test_compact_scatter.py proves
    # mesh-vs-single equivalence) AND with multi-process runs: every host
    # must pick the SAME executable while batch_fits_compact sees only its
    # local shard, so _dispatch_steps agrees on the choice with a windowed
    # collective (one DCN all-reduce covering the next window of batches,
    # amortised to 1 round trip / 8 steps; tests/test_multihost_e2e.py).
    compact_grad_scatter: bool = True
    # XLA scoped-VMEM budget for the compiled steps.  The default 16 MB
    # forces the embedding-grad scatter to stream the (106k, 16) table
    # through VMEM in column halves; at 64 MB the whole table stays
    # resident and the scatter — the largest op in every sequence model —
    # runs 36% faster (measured 3.27 -> 2.09 ms isolated, DIN step -11%).
    # Applied per-compile via jit(compiler_options=...) (the terminal owns
    # the global XLA_FLAGS); None/CPU -> compiler default.
    scoped_vmem_limit_kib: int | None = 65536
    # PRNG implementation for dropout keys. 'rbg' uses the TPU's hardware RNG
    # instructions — threefry mask generation costs ~1.3ms/step on a
    # 3-tower PLE at batch 4096, rbg makes it free. Both are deterministic
    # for a fixed seed on a fixed backend; threefry additionally guarantees
    # identical draws across backends (set rng_impl='threefry2x32' for that).
    rng_impl: str = "rbg"
    # Preemption-safe training: catch SIGTERM (the TPU-VM / k8s preemption
    # notice), finish the in-flight step, save a checkpoint and return
    # without the final eval — restart resumes from it.  The reference's
    # recovery story is Estimator's implicit restart-from-latest; this adds
    # the save-side half it lacked.  Handler installs only in the main
    # thread (signal module restriction); elsewhere the flag is a no-op.
    handle_sigterm: bool = True
    # Gradient accumulation (beyond reference): apply the optimizer every k
    # micro-batches with the mean of their gradients — an effective batch of
    # k * batch_size without the HBM for it.  optax.MultiSteps wraps the
    # optimizer; each call still runs metrics/loss on its micro-batch, and
    # `step` counts micro-batches (train_steps budgets micro-batches too).
    grad_accum_steps: int = 1


class Trainer:
    def __init__(
        self,
        model,  # nn.Module: __call__(batch, train) -> {task: logits}
        task_names: tuple[str, ...],
        optimizer: optax.GradientTransformation,
        config: TrainerConfig,
        mesh=None,
    ):
        from recalgorithm_tpu.train import optimizers as _opt

        self.model = model
        self.task_names = tuple(task_names)
        self.tx = (
            _opt.maybe_fuse(optimizer, mesh) if config.fuse_optimizer else optimizer
        )
        if config.grad_accum_steps > 1:
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=config.grad_accum_steps
            ).gradient_transformation()
        self.config = config
        self.mesh = mesh
        self._compiled = None

    # -- initialisation ------------------------------------------------------

    def init_state(self, sample_batch: Mapping[str, np.ndarray]) -> TrainState:
        rng = jax.random.key(self.config.seed, impl=self.config.rng_impl)
        batch = jax.tree.map(jnp.asarray, dict(sample_batch))
        variables = self.model.init(rng, batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            loss_mean=M.ScalarMeanState.init(),
            task_metrics={t: TaskMetrics.init() for t in self.task_names},
            # seed the summaries pytree so the train step's output structure
            # matches its input (one jit signature, no retrace at step 2)
            summaries=variables.get("summaries", {}),
        )
        if self.mesh is not None:
            shardings = mesh_lib.param_shardings(params, self.mesh)
            params = jax.device_put(params, shardings)
            # opt_state mirrors param sharding leaf-wise where shapes match;
            # simplest robust rule: re-init on sharded params.
            state = state.replace(params=params, opt_state=self.tx.init(params))
        return state

    # -- steps ---------------------------------------------------------------

    def _task_label(self, batch, task):
        """Label column for a task; models may derive joint labels (ESMM)."""
        label_idx = {name: i for i, name in enumerate(self.model.schema.labels)}
        if task in label_idx:
            return batch["labels"][:, label_idx[task]]
        if hasattr(self.model, "derived_label"):
            return self.model.derived_label(task, batch)
        raise KeyError(f"task {task!r} has no label column or derivation")

    def _loss_and_logits(self, params, batch_stats, batch, train, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = (
            ["batch_stats", "losses", "summaries"] if train else ["losses"]
        )
        rngs = {"dropout": rng} if rng is not None else None
        logits, updates = self.model.apply(
            variables, batch, train=train, rngs=rngs, mutable=mutable
        )
        weights = batch.get("_weights")
        # optional per-task loss weights (config.task_loss_weights, a tuple of
        # (task, weight) pairs — frozen dataclasses need hashable fields):
        # multi-task reweighting, or 0.0 to train a task's head by a sowed
        # loss only (TwoTower's pure in-batch-softmax mode) while its AUC /
        # accuracy metrics keep reporting
        tlw = dict(
            getattr(getattr(self.model, "config", None),
                    "task_loss_weights", ()) or ()
        )
        total = jnp.zeros((), jnp.float32)
        per_task = {}
        for task in self.task_names:
            y = self._task_label(batch, task)
            ce = optax.sigmoid_binary_cross_entropy(logits[task], y)
            if weights is not None:
                ce = ce * weights
                mean = jnp.sum(ce) / jnp.maximum(jnp.sum(weights), 1.0)
            else:
                mean = jnp.mean(ce)
            per_task[task] = mean
            total = total + tlw.get(task, 1.0) * mean
        reg = updates.get("losses", {})
        for leaf in jax.tree.leaves(reg):
            total = total + jnp.sum(leaf)
        new_bs = updates.get("batch_stats", batch_stats)
        return total, (logits, new_bs, per_task, updates.get("summaries", {}))

    def _update_metrics(self, state: TrainState, batch, logits, loss):
        weights = batch.get("_weights")
        tms = {}
        for task in self.task_names:
            y = self._task_label(batch, task)
            p = jax.nn.sigmoid(logits[task])
            tm = state.task_metrics[task]
            eps = 1e-7
            pc = jnp.clip(p, eps, 1.0 - eps)
            ce = -(y * jnp.log(pc) + (1.0 - y) * jnp.log1p(-pc))
            tms[task] = TaskMetrics(
                auc=M.auc_update(tm.auc, y, p, weights),
                acc=M.mean_update(
                    tm.acc, (jnp.where(p >= 0.5, 1.0, 0.0) == y).astype(jnp.float32),
                    weights,
                ),
                logloss=M.mean_update(tm.logloss, ce, weights),
                pmean=M.mean_update(tm.pmean, p, weights),
                ymean=M.mean_update(tm.ymean, y.astype(jnp.float32), weights),
            )
        n = jnp.sum(weights) if weights is not None else batch["labels"].shape[0]
        return state.replace(
            loss_mean=M.mean_update(
                state.loss_mean, loss[None], jnp.asarray([n], jnp.float32)
            ),
            task_metrics=tms,
        )

    def _train_step(self, state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(self._loss_and_logits, has_aux=True)
        (loss, (logits, new_bs, _, summaries)), grads = grad_fn(
            state.params, state.batch_stats, batch, True, rng
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            summaries=summaries,
        )
        return self._update_metrics(state, batch, logits, loss), loss

    def _eval_step(self, params, batch_stats, batch, eval_state):
        loss, (logits, _, _, _) = self._loss_and_logits(
            params, batch_stats, batch, False, None
        )
        return self._update_metrics(eval_state, batch, logits, loss)

    def _lookup_ctx(self, fn, compact: bool = True):
        """Set trace-time embedding-engine modes while jit traces `fn`:
        the shard_map-exchange mesh, and the compact gradient scatter
        (``compact=False`` traces the plain-scatter variant for dense
        batches the host dispatcher routes away from the compact step)."""
        from recalgorithm_tpu.embed import tables as _tables

        use_shard_map = self.config.shard_map_embeddings and self.mesh is not None
        use_compact = compact and self._use_compact
        if not (use_shard_map or use_compact):
            return fn

        def wrapped(*args):
            with contextlib.ExitStack() as stack:
                if use_shard_map:
                    stack.enter_context(_tables.shard_map_lookups(self.mesh))
                if use_compact:
                    stack.enter_context(_tables.compact_grad_scatter(True))
                return fn(*args)

        return wrapped

    @property
    def _use_compact(self) -> bool:
        """Whether the compact-scatter executable pair is in play.  Under a
        mesh the SPMD partitioner shards the compact bookkeeping (cumsum /
        searchsorted / gathers) like any other op; the shard_map lookup
        exchange, when enabled, takes precedence on the lookups it handles.
        Multi-process runs dispatch through ``_dispatch_steps``'s windowed
        collective agreement (every host must pick the SAME executable —
        a host-local batch_fits_compact decision could diverge and deadlock
        the job inside collectives; round 4 replaced the old
        disable-when-multiprocess gate with that agreement)."""
        return self.config.compact_grad_scatter

    @property
    def train_step_fn(self):
        """The train step with trace-time engine modes applied (un-jitted) —
        what _train_jit compiles; benchmark THIS, not _train_step, or the
        shard_map / compact-scatter paths silently drop out of the
        measurement (and pass ``compiler_options`` to the benchmark jit)."""
        return self._lookup_ctx(self._train_step)

    @property
    def compiler_options(self) -> dict | None:
        kib = self.config.scoped_vmem_limit_kib
        # TPU-only XLA option: a GPU backend would reject xla_tpu_* flags
        # ("axon" is the tunneled-TPU PJRT plugin's platform name)
        if kib and jax.devices()[0].platform in ("tpu", "axon"):
            return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
        return None

    def _compile(self):
        if self._compiled is None:
            donate = (0,)
            opts = self.compiler_options
            self._train_jit = jax.jit(
                self.train_step_fn, donate_argnums=donate,
                compiler_options=opts,
            )
            # plain-scatter variant for dense batches (host dispatch; only
            # compiled if such a batch ever arrives — jit is lazy)
            self._train_jit_plain = (
                jax.jit(
                    self._lookup_ctx(self._train_step, compact=False),
                    donate_argnums=donate, compiler_options=opts,
                )
                if self._use_compact else self._train_jit
            )
            self._eval_jit = jax.jit(
                self._lookup_ctx(self._eval_step), donate_argnums=(3,),
                compiler_options=opts,
            )
            self._predict_jit = jax.jit(
                self._lookup_ctx(
                    lambda params, batch_stats, batch: jax.tree.map(
                        jax.nn.sigmoid,
                        self.model.apply(
                            {"params": params, "batch_stats": batch_stats},
                            batch,
                            train=False,
                            mutable=["losses"],
                        )[0],
                    )
                ),
                compiler_options=opts,
            )
            self._compiled = True

    def _train_step_for(self, host_batch: Mapping[str, np.ndarray]):
        """Pick the executable for this batch: the compact-scatter step, or
        the plain-scatter variant when the batch's live sequence entries
        overflow the compact buffer (host-side check on the *_len columns
        — no in-graph data-dependent branch).  SINGLE-PROCESS dispatch;
        multi-process runs go through ``_dispatch_steps``."""
        if self._use_compact:
            from recalgorithm_tpu.ops.compact_scatter import batch_fits_compact

            if not batch_fits_compact(host_batch, self.model.schema):
                return self._train_jit_plain
        return self._train_jit

    def _dispatch_steps(self, batches, window: int = 8):
        """Yield (host_batch, step_fn) with a globally-consistent executable
        choice.

        Single-process: the per-batch host check.  Multi-process: hosts see
        only their local batch shard, so a host-local fits decision could
        pick DIFFERENT executables on different hosts — a program mismatch
        inside collectives that deadlocks the job.  Batches are buffered in
        windows of ``window``; each window's per-batch fits flags are
        AND-reduced across processes in ONE collective
        (multihost.agreed_all), amortising the DCN round trip to 1/window
        steps.  Requires equal per-host batch counts — the same contract
        every collective in the train step already imposes (cli/main.py's
        synchronized_iterator provides it)."""
        self._compile()
        it = iter(batches)
        if not self._use_compact or jax.process_count() == 1:
            for hb in it:
                yield hb, self._train_step_for(hb)
            return

        import itertools

        from recalgorithm_tpu.ops.compact_scatter import batch_fits_compact
        from recalgorithm_tpu.parallel import multihost

        while True:
            buf = list(itertools.islice(it, window))
            if not buf:
                return
            local = [batch_fits_compact(hb, self.model.schema) for hb in buf]
            fits = multihost.agreed_all(local, window=window)
            for hb, ok in zip(buf, fits):
                yield hb, (self._train_jit if ok else self._train_jit_plain)
            if len(buf) < window:
                return

    def _put_batch(self, batch: Mapping[str, np.ndarray]):
        batch = dict(batch)
        if self.mesh is not None:
            if jax.process_count() > 1:
                # each host feeds its local shard; rows are per-host
                from recalgorithm_tpu.parallel import multihost

                local_rows = len(next(iter(batch.values())))
                return multihost.global_batch(
                    batch, self.mesh, local_rows * jax.process_count()
                )
            sharding = mesh_lib.batch_sharding(self.mesh)
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jnp.asarray, batch)

    # -- metric reporting ----------------------------------------------------

    def _log_summaries(self, writer, step: int, state, log_fn) -> None:
        """Log the model's sown summaries (gate weights, kernel norms, ...).

        Scalars and short vectors (gate means) go to the scalar stream and
        the console — LoggingTensorHook parity (reference mmoe.py:294-309);
        larger tensors (the W&D wide kernel) become histogram records
        (tf.summary.histogram parity, wide_and_deep.py:288-291).
        """
        if not state.summaries:
            return
        flat = jax.tree_util.tree_flatten_with_path(state.summaries)[0]
        scalars: dict[str, float] = {}
        console: list[str] = []
        for path, leaf in flat:
            keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
            tag = "/".join(k for k in keys if k)
            # summaries of row-sharded tables (the W&D wide kernel) are not
            # fully addressable in a multi-process mesh; gather collectively
            # — every process logs, so every process enters the collective
            v = _leaf_to_host(leaf)
            if v.size == 1:
                scalars[f"summaries/{tag}"] = float(v)
                console.append(f"{tag}={float(v):.5f}")
            elif v.size <= 32:
                for i, x in enumerate(v.ravel()):
                    scalars[f"summaries/{tag}/{i}"] = float(x)
                console.append(
                    f"{tag}=[" + " ".join(f"{x:.4f}" for x in v.ravel()) + "]"
                )
            else:
                writer.histogram(step, f"summaries/{tag}", v)
        if scalars:
            writer.scalars(step, scalars)
        if console:
            log_fn(f"step {step} summaries: " + " ".join(console))

    def _metrics_snapshot(self, state) -> dict[str, float]:
        out = {"loss": float(M.mean_compute(state.loss_mean))}
        for task, tm in state.task_metrics.items():
            out[f"{task}_auc"] = float(M.auc_compute(tm.auc))
            out[f"{task}_accuracy"] = float(M.mean_compute(tm.acc))
            out[f"{task}_logloss"] = float(M.mean_compute(tm.logloss))
            out[f"{task}_calibration"] = float(
                M.mean_compute(tm.pmean)
            ) / max(float(M.mean_compute(tm.ymean)), 1e-7)
        return out

    def _time_eval_due(self, step: int, last_eval_time: float) -> bool:
        """Whether the wall-clock eval throttle fires at this step.

        Multi-process: wall clocks drift across hosts, and a throttle
        firing on step N on one host but N+1 on another diverges the
        per-step programs inside collectives (host A enters eval's
        collectives while host B dispatches the next train step).  So the
        check runs at a fixed step cadence — every host reaches the same
        steps — and process 0's clock decides for everyone via a
        broadcast."""
        cfg = self.config
        if not cfg.eval_throttle_secs:
            return False
        local_due = time.time() - last_eval_time >= cfg.eval_throttle_secs
        if jax.process_count() == 1:
            return local_due
        if step % cfg.log_every != 0:
            return False
        from recalgorithm_tpu.parallel import multihost

        return multihost.agreed_flag(local_due)

    # -- public API ----------------------------------------------------------

    def evaluate(
        self, state: TrainState, eval_batches: Iterable[Mapping[str, np.ndarray]]
    ) -> dict[str, float]:
        self._compile()
        eval_state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params={},
            batch_stats={},
            opt_state=(),
            loss_mean=M.ScalarMeanState.init(),
            task_metrics={t: TaskMetrics.init() for t in self.task_names},
        )
        for hb in eval_batches:
            batch = self._put_batch(hb)
            eval_state = self._eval_jit(
                state.params, state.batch_stats, batch, eval_state
            )
        return self._metrics_snapshot(eval_state)

    def predict(
        self,
        state: TrainState,
        batches: Iterable[Mapping[str, np.ndarray]],
        collect: tuple[str, ...] = (),
    ) -> dict[str, np.ndarray] | tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
        """Probabilities per task, concatenated over batches (PREDICT parity).

        Multi-process safe: the per-batch outputs are GLOBAL arrays sharded
        over the mesh — each is gathered to full host numpy collectively
        (every process enters), so every process returns the full global
        prediction set, padding rows dropped by the global ``_weights``.

        ``collect`` names extra numeric batch columns (labels, ``_index``,
        id columns) to gather through the same path; they come back row-
        aligned with the probabilities.  With a non-empty ``collect`` the
        return is ``(probs, collected)``.
        """
        self._compile()
        outs: dict[str, list[np.ndarray]] = {t: [] for t in self.task_names}
        extras: dict[str, list[np.ndarray]] = {k: [] for k in collect}
        for hb in batches:
            batch = self._put_batch(hb)
            probs = self._predict_jit(state.params, state.batch_stats, batch)
            w = batch.get("_weights")
            keep = _leaf_to_host(w) > 0 if w is not None else None
            for t in self.task_names:
                p = _leaf_to_host(probs[t])
                outs[t].append(p[keep] if keep is not None else p)
            for k in collect:
                v = _leaf_to_host(batch[k])
                extras[k].append(v[keep] if keep is not None else v)
        result = {
            t: np.concatenate(v) if v else np.empty((0,))
            for t, v in outs.items()
        }
        if collect:
            return result, {
                k: np.concatenate(v) if v else np.empty((0,))
                for k, v in extras.items()
            }
        return result

    def train_and_evaluate(
        self,
        train_batches: Iterable[Mapping[str, np.ndarray]],
        eval_batches_fn: Callable[[], Iterable[Mapping[str, np.ndarray]]] | None = None,
        state: TrainState | None = None,
        log_fn: Callable[[str], None] = print,
    ) -> tuple[TrainState, dict[str, float]]:
        from recalgorithm_tpu.utils.summary import SummaryWriter

        cfg = self.config
        self._compile()
        rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
        checkpointer = _Checkpointer(cfg.model_dir, cfg.keep_best,
                                     mesh=self.mesh)
        summary = SummaryWriter(os.path.join(cfg.model_dir, "summaries"))

        train_iter = self._dispatch_steps(train_batches)
        if state is None:
            first, first_fn = next(train_iter)
            state = self.init_state(first)
            state = checkpointer.restore_latest(state)
            # re-feed the first batch unless we resumed past it
            if int(state.step) == 0:
                batch = self._put_batch(first)
                rng, sub = jax.random.split(rng)
                state, _ = first_fn(state, batch, sub)

        # preemption notice (SIGTERM): finish the in-flight step, save, skip
        # the final eval — the checkpoint is the deliverable under a grace
        # period.  Installs only in the main thread; restored on return.
        preempted = {"flag": False}
        prev_handler = None
        if cfg.handle_sigterm:
            import signal

            try:
                prev_handler = signal.signal(
                    signal.SIGTERM,
                    lambda signum, frame: preempted.update(flag=True),
                )
            except ValueError:  # not the main thread
                prev_handler = None

        t0 = time.time()
        last_eval_time = time.time()
        last_log_step = int(state.step)
        final_eval: dict[str, float] = {}
        while int(state.step) < cfg.train_steps and not preempted["flag"]:
            try:
                hb, step_fn = next(train_iter)
            except StopIteration:
                break
            batch = self._put_batch(hb)
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state, batch, sub)
            step = int(state.step)
            if step % cfg.log_every == 0 and step != last_log_step:
                snap = self._metrics_snapshot(state)
                dt = time.time() - t0
                rate = (step - last_log_step) * batch["labels"].shape[0] / max(dt, 1e-9)
                log_fn(
                    f"step {step} loss={snap['loss']:.5f} "
                    + " ".join(
                        f"{t}_auc={snap[f'{t}_auc']:.5f}" for t in self.task_names
                    )
                    + f" ({rate:,.0f} ex/s)"
                )
                summary.scalars(step, {f"train/{k}": v for k, v in snap.items()}
                                | {"train/examples_per_s": rate})
                self._log_summaries(summary, step, state, log_fn)
                t0, last_log_step = time.time(), step
            if cfg.save_checkpoints_steps and step % cfg.save_checkpoints_steps == 0:
                checkpointer.save(state)
            due_steps = cfg.eval_every_steps and step % cfg.eval_every_steps == 0
            due_time = self._time_eval_due(step, last_eval_time)
            if eval_batches_fn is not None and (due_steps or due_time):
                ev = self.evaluate(state, eval_batches_fn())
                last_eval_time = time.time()
                log_fn(f"eval @ {step}: {ev}")
                summary.scalars(step, {f"eval/{k}": v for k, v in ev.items()})
                checkpointer.maybe_export_best(
                    state, ev[f"{self.task_names[0]}_auc"]
                )
        checkpointer.save(state)
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)
        if preempted["flag"]:
            checkpointer.mgr.wait_until_finished()  # save really on disk
            log_fn(
                f"SIGTERM: checkpoint saved at step {int(state.step)}, "
                "skipping final eval (restart resumes from it)"
            )
            summary.close()
            checkpointer.close()
            return state, final_eval
        if eval_batches_fn is not None:
            final_eval = self.evaluate(state, eval_batches_fn())
            log_fn(f"final eval: {final_eval}")
            summary.scalars(
                int(state.step), {f"eval/{k}": v for k, v in final_eval.items()}
            )
            checkpointer.maybe_export_best(
                state, final_eval[f"{self.task_names[0]}_auc"]
            )
        summary.close()
        checkpointer.close()
        return state, final_eval


def _leaf_to_host(x):
    """One leaf -> full host numpy.  Single-process arrays are fully
    addressable — device_get suffices even when sharded over a local mesh.
    Across processes the leaf is first re-laid-out to a replicated sharding
    (XLA all-gather over ICI/DCN), which every process must enter
    collectively."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _gather_to_host(tree):
    """Full host-numpy copies of a (possibly sharded) param tree."""
    return jax.tree.map(_leaf_to_host, tree)


# round-2 renamed PLE's shared ExpertGroup param scopes so the expert-
# parallelism sharding rule can identify them; round-1 checkpoints carry the
# old paths.  restore_latest() falls back through this map (new -> legacy).
_LEGACY_PARAM_RENAMES = {
    "experts_shared": "shared",
    "experts_shared_final": "shared_final",
}


def _has_dict_keys(tree, keys) -> bool:
    if isinstance(tree, Mapping):
        return any(k in keys for k in tree) or any(
            _has_dict_keys(v, keys) for v in tree.values()
        )
    if isinstance(tree, (list, tuple)):
        return any(_has_dict_keys(v, keys) for v in tree)
    return False


def _rename_dict_keys(tree, mapping):
    """Recursively rename dict keys through nested dict/list/tuple/NamedTuple
    containers (param trees and the optax states that mirror them)."""
    if isinstance(tree, Mapping):
        return {
            mapping.get(k, k): _rename_dict_keys(v, mapping)
            for k, v in tree.items()
        }
    if isinstance(tree, tuple):
        vals = [_rename_dict_keys(v, mapping) for v in tree]
        return type(tree)(*vals) if hasattr(tree, "_fields") else tuple(vals)
    if isinstance(tree, list):
        return [_rename_dict_keys(v, mapping) for v in tree]
    return tree


class _Checkpointer:
    """Orbax checkpoint manager + best-AUC serving exporter."""

    def __init__(self, model_dir: str, keep_best: int, mesh=None):
        import orbax.checkpoint as ocp

        self.mesh = mesh
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.model_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
        )
        self.keep_best = keep_best
        self.best_path = os.path.join(self.model_dir, "best_exports.json")
        self.best: list[tuple[float, int]] = []
        if os.path.exists(self.best_path):
            with open(self.best_path) as f:
                self.best = [tuple(x) for x in json.load(f)]

    def save(self, state: TrainState):
        import orbax.checkpoint as ocp

        self.mgr.save(
            int(state.step),
            args=ocp.args.StandardSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": state.step}
            ),
        )

    def restore_latest(self, state: TrainState) -> TrainState:
        import orbax.checkpoint as ocp

        latest = self.mgr.latest_step()
        if latest is None:
            return state
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        try:
            restored = self.mgr.restore(
                latest, args=ocp.args.StandardRestore(template)
            )
        except Exception as first_err:
            # legacy-layout fallback: restore against the old param paths,
            # then rename back to the current ones (PLE round-1 compat)
            if not _has_dict_keys(template, _LEGACY_PARAM_RENAMES):
                raise  # no renamable keys -> genuine failure
            legacy = _rename_dict_keys(template, _LEGACY_PARAM_RENAMES)
            try:
                restored = self.mgr.restore(
                    latest, args=ocp.args.StandardRestore(legacy)
                )
            except Exception:
                # the checkpoint is neither current- nor legacy-layout:
                # surface the ORIGINAL failure, not the fallback's
                # confusing missing-legacy-key error
                raise first_err
            restored = _rename_dict_keys(
                restored, {v: k for k, v in _LEGACY_PARAM_RENAMES.items()}
            )

        # Re-pin restored leaves: Orbax restores scalars/replicated leaves
        # COMMITTED to a single device while table leaves come back
        # mesh-sharded, and jit refuses the mixed placement (mesh-resume
        # would fail on the first step after restore).  Sharded-template
        # leaves keep their sharding; everything else goes mesh-replicated.
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = (
            NamedSharding(self.mesh, PartitionSpec())
            if self.mesh is not None else None
        )

        def repin(tmpl, got):
            if not isinstance(got, jax.Array):
                return got
            want = getattr(tmpl, "sharding", None)
            if replicated is not None and (
                want is None or not isinstance(want, NamedSharding)
            ):
                want = replicated
            if want is not None and got.sharding != want:
                return jax.device_put(got, want)
            return got

        restored = jax.tree.map(repin, template, restored)
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def maybe_export_best(self, state: TrainState, auc: float):
        """Keep the `keep_best` highest-AUC serving artifacts (BestExporter parity).

        Mesh/multi-host safe: params sharded across processes are gathered
        to full host arrays on every process (the gather is a collective, so
        all processes must enter), then only process 0 writes the artifact.
        The ``self.best`` bookkeeping runs IDENTICALLY on every process (auc
        and step are globally consistent inputs) so the early-return decision
        never diverges — a process skipping the collective while others enter
        it would deadlock the job.
        """
        step = int(state.step)
        if len(self.best) >= self.keep_best and auc <= min(a for a, _ in self.best):
            return
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        tree = _gather_to_host(tree)
        # identical bookkeeping on every process (fs writes are p0-only)
        self.best.append((auc, step))
        self.best.sort(reverse=True)
        evicted = self.best[self.keep_best:]
        self.best = self.best[: self.keep_best]
        if jax.process_index() != 0:
            return
        export_dir = os.path.join(self.model_dir, "export", f"best_{step}")
        os.makedirs(export_dir, exist_ok=True)
        with open(os.path.join(export_dir, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(tree))
        with open(os.path.join(export_dir, "metrics.json"), "w") as f:
            json.dump({"auc": auc, "step": step}, f)
        for auc_old, step_old in evicted:
            stale = os.path.join(self.model_dir, "export", f"best_{step_old}")
            if os.path.isdir(stale):
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
        with open(self.best_path, "w") as f:
            json.dump(self.best, f)

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
