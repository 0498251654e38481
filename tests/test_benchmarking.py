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
