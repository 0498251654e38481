"""Optimizers with reference parity, as optax transformations.

The reference's optimizer menu (e.g. wide_and_deep.py:254-272, dien.py:328):
Adam, Adagrad, FTRL, RMSProp, SGD, LazyAdam, plus the Wide&Deep dual-optimizer
split (FTRL on the wide part, the chosen optimizer on the deep part,
wide_and_deep.py:251-276) expressed with ``optax.multi_transform``.

Two of them are not in optax and are implemented here:

  * ``ftrl`` — TF FtrlOptimizer semantics (FTRL-proximal, McMahan et al.):
    per-coordinate z/n accumulators, learning_rate_power=-0.5,
    initial_accumulator_value=0.1, optional l1/l2.
  * ``lazy_adam`` — TF contrib LazyAdamOptimizer semantics: moment updates and
    parameter steps are applied only at coordinates whose gradient is nonzero
    this step.  With dense embedding-gather gradients, "nonzero rows" is
    exactly the set of touched rows, so behaviour matches the sparse-update
    semantics the reference relies on for DIEN.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class FtrlState(NamedTuple):
    z: Any
    n: Any


def ftrl(
    learning_rate: float,
    learning_rate_power: float = -0.5,
    initial_accumulator_value: float = 0.1,
    l1_regularization_strength: float = 0.0,
    l2_regularization_strength: float = 0.0,
) -> optax.GradientTransformation:
    """FTRL-proximal with TF1 FtrlOptimizer defaults.

    NOTE: like TF's implementation this transformation *replaces* the
    parameter (returns ``new_w - w`` as the update) rather than producing a
    descent direction.
    """
    alpha = learning_rate
    p = learning_rate_power
    l1 = l1_regularization_strength
    l2 = l2_regularization_strength

    def init(params):
        return FtrlState(
            z=jax.tree.map(jnp.zeros_like, params),
            n=jax.tree.map(
                lambda t: jnp.full_like(t, initial_accumulator_value), params
            ),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("ftrl requires params")
        n_new = jax.tree.map(lambda g, n: n + g * g, grads, state.n)
        z_new = jax.tree.map(
            lambda z, g, nn, n, w: z + g - (nn ** (-p) - n ** (-p)) / alpha * w,
            state.z, grads, n_new, state.n, params,
        )
        def w_next(zn, nn):
            denom = nn ** (-p) / alpha + 2.0 * l2
            return jnp.where(
                jnp.abs(zn) > l1, -(zn - jnp.sign(zn) * l1) / denom, 0.0
            )
        updates = jax.tree.map(
            lambda zn, nn, w: w_next(zn, nn) - w, z_new, n_new, params
        )
        return updates, FtrlState(z=z_new, n=n_new)

    return optax.GradientTransformation(init, update)


class LazyAdamState(NamedTuple):
    count: Any  # scalar global step (TF LazyAdam bias-correction semantics)
    mu: Any
    nu: Any


def lazy_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """LazyAdam: update moments/params only where the gradient is nonzero.

    Bias correction uses the scalar GLOBAL step, exactly as TF contrib's
    LazyAdamOptimizer does (the reference's DIEN optimizer, dien.py:328-329)
    — and unlike a per-coordinate count it costs no extra full-table int32
    pass per step (the count tensor was ~250 us/step of (106k,16)-sized
    convert+add traffic on DIEN's profile).
    """

    def init(params):
        return LazyAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        cnt_new = state.count + 1
        mu_new = jax.tree.map(
            lambda g, mu: jnp.where(g != 0, b1 * mu + (1 - b1) * g, mu),
            grads, state.mu,
        )
        nu_new = jax.tree.map(
            lambda g, nu: jnp.where(g != 0, b2 * nu + (1 - b2) * g * g, nu),
            grads, state.nu,
        )

        # schedules are evaluated at the 0-based pre-increment step,
        # matching optax.scale_by_schedule
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)

        def step(g, mu, nu):
            cf = cnt_new.astype(g.dtype)
            mu_hat = mu / (1 - b1**cf)
            nu_hat = nu / (1 - b2**cf)
            s = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
            return jnp.where(g != 0, s, 0.0)

        updates = jax.tree.map(step, grads, mu_new, nu_new)
        return updates, LazyAdamState(count=cnt_new, mu=mu_new, nu=nu_new)

    return optax.GradientTransformation(init, update)


class UnfuseableTransform(optax.GradientTransformation):
    """A GradientTransformation that must see the real parameter tree.

    ``optax.multi_transform`` computes its labels from the parameter pytree
    structure, so it cannot be wrapped in ``optax.flatten`` (the label_fn
    would see one flat vector).  ``Trainer`` skips optimizer fusion for
    instances of this class.
    """

    __slots__ = ()


def maybe_fuse(tx: optax.GradientTransformation, mesh=None) -> optax.GradientTransformation:
    """Fuse a coordinate-wise optimizer into one flat-buffer update.

    Every optimizer in this module is coordinate-wise, so ``optax.flatten``
    is semantics-preserving (bitwise per coordinate; covered by
    tests/test_optimizers.py).  Honest K-step-loop timing on v5e shows it is
    NOT a win there: per-leaf updates cost ~20us for 2.5M params while the
    flat vector's ravel/unravel relayout costs ~1.5ms/step, so the Trainer
    default leaves it off.  It remains useful on dispatch-latency-bound
    backends with very leaf-heavy trees.  Skipped when the params are
    mesh-sharded (ravelling would gather the row-sharded embedding tables
    onto every device) and for ``UnfuseableTransform``s (label-routed
    multi_transform).
    """
    if mesh is not None or isinstance(tx, UnfuseableTransform):
        return tx
    return optax.flatten(tx)


def make_schedule(
    learning_rate: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int = 0,
    end_lr_factor: float = 0.01,
):
    """LR schedule factory (beyond reference — the reference trains at a
    fixed LR only).  Returns a float for 'constant' with no warmup (keeps
    the optimizer state scalar-free) or an optax schedule otherwise.

      constant     flat LR (optionally after linear warmup)
      cosine       cosine decay to end_lr_factor * lr over decay_steps
      exponential  x0.1 every decay_steps (staircase off)

    Warmup ramps linearly from 0 over ``warmup_steps`` and composes with
    any of the above.
    """
    schedule = schedule.lower()
    if schedule == "constant":
        if warmup_steps <= 0:
            return learning_rate
        body = optax.constant_schedule(learning_rate)
    elif schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("cosine schedule requires decay_steps > 0")
        body = optax.cosine_decay_schedule(
            learning_rate, decay_steps, alpha=end_lr_factor
        )
    elif schedule == "exponential":
        if decay_steps <= 0:
            raise ValueError("exponential schedule requires decay_steps > 0")
        body = optax.exponential_decay(learning_rate, decay_steps, 0.1)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules([warmup, body], [warmup_steps])
    return body


def build(name: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Optimizer factory with the reference's names and defaults.

    ``learning_rate`` may be a float or an optax schedule (callable) for
    the optax-backed optimizers and lazyadam; ftrl's closed form bakes
    alpha into its accumulators and supports floats only.
    """
    name = name.lower()
    if callable(learning_rate) and name == "ftrl":
        raise ValueError("ftrl supports a constant learning rate only")
    if name == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adagrad":
        # reference uses initial_accumulator_value=1e-8 (wide_and_deep.py:264-265)
        return optax.adagrad(
            learning_rate,
            initial_accumulator_value=kwargs.get("initial_accumulator_value", 1e-8),
        )
    if name == "ftrl":
        return ftrl(learning_rate, **kwargs)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate)
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "lazyadam":
        return lazy_adam(learning_rate)
    raise ValueError(f"unknown optimizer {name!r}")


def dual_wide_deep(
    wide_lr: float,
    deep_optimizer: str,
    deep_lr: float,
    wide_predicate,
) -> optax.GradientTransformation:
    """Wide&Deep dual optimizer: FTRL on wide params, `deep_optimizer` on the rest.

    ``wide_predicate(path_tuple) -> bool`` selects wide params by tree path.
    Mirrors wide_and_deep.py:251-276 (variable-scope based var_lists).
    """
    label_fn = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, _: "wide" if wide_predicate(path) else "deep", params
    )
    return UnfuseableTransform(
        *optax.multi_transform(
            {
                "wide": ftrl(wide_lr),
                "deep": build(deep_optimizer, deep_lr),
            },
            label_fn,
        )
    )
