"""Serving-path benchmark: forward-only (inference) step time per batch size.

Measures the jitted predict function (sigmoid forward, no dropout/BN updates)
for the flagship DIN model at serving-typical batch sizes, with the K-step
loop-slope method (per-call timing lies on tunneled TPUs; see
utils/benchmarking.py).  Single-example latency on a tunneled chip is
dominated by the tunnel RTT, so the honest per-request number on real
hardware is step_us at the chosen batch.

Run: python benchmarks/bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from recalgorithm_tpu.data.synthetic import SyntheticWeChat, SyntheticConfig
    from recalgorithm_tpu.features.schema import wechat_schema
    from recalgorithm_tpu.models.din import DIN, DINConfig
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_us

    on_tpu = jax.devices()[0].platform != "cpu"
    gen = SyntheticWeChat(wechat_schema(), SyntheticConfig(seed=7))
    schema = wechat_schema(gen.vocab_sizes())
    cfg = DINConfig(use_fused_attention=on_tpu)
    model = DIN(config=cfg, schema=schema)

    results = {}
    for b in (128, 1024, 4096) if on_tpu else (128,):
        batch = {k: jnp.asarray(v) for k, v in gen.batch(b, 0).items()}
        variables = model.init(jax.random.key(0), batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def step(state, bt, rng):
            # perturb params through the carry so the forward can't be
            # loop-hoisted; the perturbation is numerically invisible
            p = jax.tree.map(lambda x: x * (1.0 + 1e-30 * state), params)
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, bt,
                train=False, mutable=["losses"],
            )
            prob = jax.nn.sigmoid(out["read_comment"])
            return state + 0.0 * prob[0], jnp.sum(prob)

        us = loop_step_time_us(step, jnp.zeros(()), batch, k_small=8,
                               k_big=72 if on_tpu else 24)
        results[f"b{b}_us"] = round(us, 1)
        results[f"b{b}_examples_per_s"] = round(b / us * 1e6, 1)

    print(json.dumps({"metric": "din_serving_forward", **results}))


if __name__ == "__main__":
    main()
