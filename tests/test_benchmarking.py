"""loop_step_time_us sanity: measures a real per-step cost on CPU."""

import jax
import jax.numpy as jnp

from recalgorithm_tpu.utils.benchmarking import loop_step_time_us


def test_loop_step_time_positive_and_scales():
    # step cost must show up in the slope; a 1024x1024 matmul chain per step
    n = 512
    a = jnp.eye(n) * 0.999

    def step(state, batch, rng):
        s = state @ a
        return s, jnp.sum(s[0])

    us = loop_step_time_us(step, jnp.ones((n, n)), {}, k_small=2, k_big=12,
                           repeats=2)
    assert us > 0.5, us  # a 512^3 matmul costs >0.5us on any CPU

    def step2(state, batch, rng):
        s = state
        for _ in range(4):
            s = s @ a
        return s, jnp.sum(s[0])

    us2 = loop_step_time_us(step2, jnp.ones((n, n)), {}, k_small=2, k_big=12,
                            repeats=3)
    assert us2 > us * 1.5, (us, us2)  # 4x the work -> clearly more


def test_loop_step_time_stats_reps_and_budget():
    from recalgorithm_tpu.utils.benchmarking import loop_step_time_stats

    n = 256
    a = jnp.eye(n) * 0.999

    def step(state, batch, rng):
        s = state @ a
        return s, jnp.sum(s[0])

    stats = loop_step_time_stats(step, jnp.ones((n, n)), {}, reps=3,
                                 k_small=2, k_big=12, repeats=1)
    assert len(stats["reps_us"]) == 3
    assert stats["median_us"] == sorted(stats["reps_us"])[1]
    assert stats["sigma_us"] >= 0.0
    # a zero budget still yields the >=2-rep floor
    stats2 = loop_step_time_stats(step, jnp.ones((n, n)), {}, reps=5,
                                  time_budget_s=0.0,
                                  k_small=2, k_big=12, repeats=1)
    assert len(stats2["reps_us"]) == 2
