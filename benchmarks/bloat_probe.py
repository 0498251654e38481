"""Ablation probe for the 'in-graph bloat' (docs/ROADMAP.md): decompose the
BST / W&D train-step cost on the real chip by slope-timing variants.

Every variant is expressed as a (state, batch, rng) -> (state, loss) step so
utils/benchmarking.loop_step_time_us measures it the same way run_all.py
measures the real step.  Loop-invariant hoisting is defeated by feeding the
carried loss back into the batch (1 + 1e-30*loss scaling).

Run: python benchmarks/bloat_probe.py [--model BST] [--batch_size 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="BST")
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--fused", action="store_true", default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models import MODEL_REGISTRY
    from recalgorithm_tpu.train import optimizers
    from recalgorithm_tpu.train.loop import Trainer, TrainerConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    B = args.batch_size
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    cfg_cls, model_cls = MODEL_REGISTRY[args.model]

    results = {}

    def bench(tag, cfg_kwargs=None, step_override=None, trainer_patch=None):
        kwargs = {"batch_size": B}
        if args.model in ("DIN", "BST") and jax.devices()[0].platform != "cpu":
            kwargs["use_fused_attention"] = True
        kwargs.update(cfg_kwargs or {})
        cfg = cfg_cls(**kwargs)
        model = model_cls(config=cfg, schema=schema)
        opt = optimizers.build(getattr(cfg, "optimizer", "adam"), 1e-3)
        trainer = Trainer(
            model, cfg.task_names, opt,
            TrainerConfig(model_dir=f"/tmp/probe_{tag}", train_steps=1,
                          save_checkpoints_steps=0),
        )
        if trainer_patch:
            trainer_patch(trainer)
        state = trainer.init_state(gen.batch(B, 0))
        batch = trainer._put_batch(gen.batch(B, 0))
        step = step_override(trainer) if step_override else trainer.train_step_fn
        us = loop_step_time_us(step, state, batch,
                               compiler_options=trainer.compiler_options)
        results[tag] = round(us, 1)
        print(f"{tag}: {us:,.0f} us", flush=True)
        return us

    # ---- variants ----------------------------------------------------------
    bench("full")

    # loss+grads+adam, but NO metric update (AUC/acc streaming)
    def no_metrics(trainer):
        def step(state, batch, rng):
            grad_fn = jax.value_and_grad(trainer._loss_and_logits, has_aux=True)
            (loss, (_, new_bs, _, _)), grads = grad_fn(
                state.params, state.batch_stats, batch, True, rng
            )
            updates, new_opt = trainer.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 batch_stats=new_bs, opt_state=new_opt), loss
        return step
    bench("no_metrics", step_override=no_metrics)

    # forward-only loss (no grad, no optimizer, no metrics); batch perturbed
    # by the carried loss so nothing hoists out of the measurement loop
    def fwd_only(trainer):
        def step(state, batch, rng):
            eps = 1e-30 * state.loss_mean.total
            pb = dict(batch)
            pb["dense"] = batch["dense"] * (1 + eps)
            loss, _ = trainer._loss_and_logits(
                state.params, state.batch_stats, pb, True, rng
            )
            return state.replace(
                loss_mean=state.loss_mean.__class__(
                    total=loss, count=state.loss_mean.count)
            ), loss
        return step
    bench("fwd_only", step_override=fwd_only)

    if args.model == "BST":
        bench("no_transformer", cfg_kwargs={"num_transformer_block": 0})
        bench("plain_xla_attention", cfg_kwargs={"use_fused_attention": False})
        bench("no_dropout", cfg_kwargs={"dropout_rate": 0.0})
        bench("no_bn", cfg_kwargs={"batch_norm": False})

        # isolated transformer block fwd+bwd at model shapes
        from recalgorithm_tpu.ops.attention import BSTTransformerBlock

        T, d = 51, 16
        rngk = jax.random.key(0)
        x0 = jax.random.normal(rngk, (B, T, d), jnp.float32)
        lengths = jnp.full((B,), T, jnp.int32)
        for fused, tag in ((True, "block_isolated_fused"),
                           (False, "block_isolated_xla")):
            blk = BSTTransformerBlock(3, T, fused=fused)
            params = blk.init(jax.random.key(1), x0, lengths)

            def blk_step(state, batch, rng, blk=blk):
                params, acc = state
                xx = x0 * (1 + 1e-30 * acc)
                loss, grads = jax.value_and_grad(
                    lambda p: jnp.sum(blk.apply(p, xx, lengths) ** 2)
                )(params)
                new_p = jax.tree.map(lambda a, g: a - 1e-9 * g, params, grads)
                return (new_p, loss), loss

            us = loop_step_time_us(blk_step, (params, jnp.zeros(())), {})
            results[tag] = round(us, 1)
            print(f"{tag}: {us:,.0f} us", flush=True)

    if args.model == "WideAndDeep":
        bench("deep_only", cfg_kwargs={"cross_hash_buckets": 1})
        bench("no_bn", cfg_kwargs={"batch_norm": False})

    out = os.path.join(os.path.dirname(__file__), f"BLOAT_{args.model}.json")
    with open(out, "w") as f:
        json.dump({"batch_size": B, "times_us": results}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
