"""Honest on-device step timing.

Per-call wall timing of a jitted step is unreliable on remote/tunneled TPU
backends: dispatch acknowledgement can return before the device work is done,
so `block_until_ready` on a small result under-reports grossly (measured
>100x on tunneled v5e).  The robust pattern is to run K steps *inside one
executable* (lax.fori_loop with a donated carry) for two values of K and take
the slope — fixed dispatch/sync overhead cancels, leaving pure per-step
device time.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


def loop_step_time_us(
    step_fn: Callable,  # (state, batch, rng) -> (state, scalar loss)
    state,
    batch,
    *,
    k_small: int = 8,
    k_big: int = 72,
    repeats: int = 3,
    seed: int = 0,
    rng_impl: str = "rbg",  # match Trainer's default dropout PRNG
    compiler_options: dict | None = None,  # match Trainer.compiler_options
) -> float:
    """Median per-step time (us) of `step_fn`, measured as a K-step slope.

    Builds jit(fori_loop(K x step_fn)) for k_small and k_big, times each with
    a synced call, and returns (t_big - t_small) / (k_big - k_small).  The
    state carry is donated, matching steady-state training; the same batch is
    re-fed every step (data pipeline excluded by design — benchmark it
    separately).
    """

    def make(k: int):
        @functools.partial(jax.jit, compiler_options=compiler_options)
        def run(state, batch, key):
            def body(i, carry):
                st, _ = carry
                return step_fn(st, batch, jax.random.fold_in(key, i))

            st, loss = jax.lax.fori_loop(
                0, k, body, (state, jnp.zeros((), jnp.float32))
            )
            return st, loss

        return run

    run_small, run_big = make(k_small), make(k_big)

    def timed(fn) -> float:
        # Tunneled backends have been observed to return from
        # block_until_ready before the device work is done; the only reliable
        # sync point is an actual host fetch.  So: vary the rng input every
        # call, keep the full output alive until after a scalar fetch of the
        # loss, throw the first timed call away, and take the median — never
        # the min.
        st, loss = fn(state, batch, jax.random.key(seed, impl=rng_impl))  # compile + warm
        float(loss)
        times = []
        for r in range(repeats + 1):
            key = jax.random.key(seed + 1 + r, impl=rng_impl)
            t0 = time.perf_counter()
            st2, loss = fn(state, batch, key)
            float(loss)  # host fetch = true barrier
            times.append(time.perf_counter() - t0)
            del st2
        times = sorted(times[1:])
        return times[len(times) // 2]

    t_small = timed(run_small)
    t_big = timed(run_big)
    return max(t_big - t_small, 1e-9) / (k_big - k_small) * 1e6


def loop_step_time_stats(
    step_fn: Callable,
    state,
    batch,
    *,
    reps: int = 5,
    seed: int = 0,
    time_budget_s: float | None = None,
    **kw,
) -> dict:
    """Median ± σ over ``reps`` INDEPENDENT slope measurements.

    Variance protocol (round-5): a single slope number hides run-to-run
    spread — same-day artifacts disagreed by ~3% with no way to tell noise
    from regression.  Each rep here calls :func:`loop_step_time_us` afresh:
    the jitted K-loop closures are rebuilt from scratch (new function
    objects -> fresh trace + XLA compile), so the spread captures
    compile-schedule and device-state variance, not just timer jitter
    within one cached executable.

    ``time_budget_s`` stops early (keeping >=2 reps) so callers under a
    watchdog degrade to fewer reps instead of a missing artifact.

    Returns ``{"median_us", "sigma_us", "reps_us"}`` — σ is the sample
    standard deviation over the reps actually run.
    """
    t0 = time.perf_counter()
    vals: list[float] = []
    for r in range(reps):
        vals.append(
            loop_step_time_us(step_fn, state, batch, seed=seed + 101 * r, **kw)
        )
        if (time_budget_s is not None and len(vals) >= 2
                and time.perf_counter() - t0 > time_budget_s):
            break
    s = sorted(vals)
    n = len(s)
    median = s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])
    mean = sum(s) / n
    sigma = (sum((v - mean) ** 2 for v in s) / max(n - 1, 1)) ** 0.5
    return {"median_us": median, "sigma_us": sigma, "reps_us": vals}
