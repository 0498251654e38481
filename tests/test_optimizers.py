"""Optimizer parity tests: FTRL closed form, LazyAdam sparsity, dual transform."""

import jax
import jax.numpy as jnp
import numpy as np

from recalgorithm_tpu.train import optimizers


def test_ftrl_matches_closed_form():
    """With constant gradient g and l1=l2=0, FTRL-proximal has the closed form
    w_T = -(sum_t g - sum_t sigma_t w_t) / (sqrt(n_T)/alpha); verify against a
    step-by-step NumPy simulation."""
    alpha, acc0 = 0.1, 0.1
    tx = optimizers.ftrl(alpha, initial_accumulator_value=acc0)
    w = jnp.asarray([1.0, -2.0, 0.5])
    params = {"w": w}
    state = tx.init(params)

    wn = np.asarray(w, np.float64)
    z = np.zeros(3)
    n = np.full(3, acc0)
    g = np.asarray([0.3, -0.1, 0.05])
    for _ in range(5):
        updates, state = tx.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        params = {"w": params["w"] + updates["w"]}
        # numpy reference
        n_new = n + g * g
        sigma = (np.sqrt(n_new) - np.sqrt(n)) / alpha
        z = z + g - sigma * wn
        wn = -z / (np.sqrt(n_new) / alpha)
        n = n_new
    np.testing.assert_allclose(np.asarray(params["w"]), wn, rtol=1e-5)


def test_ftrl_l1_sparsifies():
    tx = optimizers.ftrl(0.1, l1_regularization_strength=10.0)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([0.01])}, state, params)
    # huge l1 drives the weight exactly to zero
    np.testing.assert_allclose(np.asarray(params["w"] + updates["w"]), 0.0)


def test_lazy_adam_skips_untouched_rows():
    tx = optimizers.lazy_adam(0.1)
    params = {"t": jnp.ones((4, 2))}
    state = tx.init(params)
    g = jnp.zeros((4, 2)).at[1].set(0.5)
    updates, state = tx.update({"t": g}, state, params)
    u = np.asarray(updates["t"])
    assert np.all(u[0] == 0) and np.all(u[2] == 0) and np.all(u[3] == 0)
    assert np.all(u[1] != 0)
    # second step touching row 3 only: row 1 stays frozen
    g2 = jnp.zeros((4, 2)).at[3].set(-0.2)
    updates2, _ = tx.update({"t": g2}, state, params)
    u2 = np.asarray(updates2["t"])
    assert np.all(u2[1] == 0) and np.all(u2[3] != 0)


def test_maybe_fuse_matches_unfused():
    """optax.flatten is a pure perf transform for coordinate-wise optimizers:
    fused and per-leaf updates must agree bitwise per coordinate."""
    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        "b": {"c": jnp.asarray(rng.normal(size=(7,)), jnp.float32)},
    }
    for name in ("adam", "ftrl", "lazyadam", "adagrad", "rmsprop", "sgd"):
        tx = optimizers.build(name, 0.05)
        fx = optimizers.maybe_fuse(tx)
        s, fs = tx.init(params), fx.init(params)
        p, fp = params, params
        for step in range(3):
            g = jax.tree.map(
                lambda t: jnp.asarray(
                    rng.normal(size=t.shape), jnp.float32
                ) * (rng.random(t.shape) > 0.3),
                params,
            )
            u, s = tx.update(g, s, p)
            fu, fs = fx.update(g, fs, fp)
            p = jax.tree.map(lambda a, b: a + b, p, u)
            fp = jax.tree.map(lambda a, b: a + b, fp, fu)
        for l1, l2 in zip(jax.tree.leaves(p), jax.tree.leaves(fp)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2), err_msg=name)


def test_maybe_fuse_skips_sharded_and_multi_transform():
    tx = optimizers.build("adam", 0.1)
    assert optimizers.maybe_fuse(tx, mesh=object()) is tx
    dual = optimizers.dual_wide_deep(0.5, "sgd", 0.1, lambda path: False)
    assert optimizers.maybe_fuse(dual) is dual


def test_dual_wide_deep_routes_by_path():
    tx = optimizers.dual_wide_deep(
        wide_lr=0.5, deep_optimizer="sgd", deep_lr=0.1,
        wide_predicate=lambda path: "wide" in str(path[0]),
    )
    params = {"wide_w": jnp.asarray([1.0]), "deep_w": jnp.asarray([1.0])}
    state = tx.init(params)
    g = {"wide_w": jnp.asarray([1.0]), "deep_w": jnp.asarray([1.0])}
    updates, _ = tx.update(g, state, params)
    # deep side: plain SGD -> -lr * g
    np.testing.assert_allclose(np.asarray(updates["deep_w"]), [-0.1], rtol=1e-6)
    # wide side: FTRL replaces the weight (update != -lr*g)
    assert abs(float(updates["wide_w"][0]) + 0.5) > 1e-3


def test_make_schedule_shapes_and_values():
    """Schedule factory (beyond reference): warmup ramp, cosine tail,
    exponential staircase-free decay, ftrl's constant-only contract."""
    import pytest

    # constant without warmup stays a plain float (scalar-free opt state)
    assert optimizers.make_schedule(0.01) == 0.01
    # warmup: 0 -> lr linearly over warmup_steps, then flat
    s = optimizers.make_schedule(0.01, "constant", warmup_steps=10)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(5)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.01, rtol=1e-6)
    # cosine: lr at 0, end_lr_factor*lr at decay_steps
    s = optimizers.make_schedule(0.01, "cosine", decay_steps=100)
    np.testing.assert_allclose(float(s(0)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0001, rtol=1e-4)
    # warmup + cosine: peak at the warmup boundary
    s = optimizers.make_schedule(0.01, "cosine", warmup_steps=10,
                                 decay_steps=100)
    np.testing.assert_allclose(float(s(10)), 0.01, rtol=1e-6)
    assert float(s(60)) < 0.01
    # exponential: x0.1 per decay_steps
    s = optimizers.make_schedule(0.01, "exponential", decay_steps=50)
    np.testing.assert_allclose(float(s(50)), 0.001, rtol=1e-5)
    with pytest.raises(ValueError):
        optimizers.make_schedule(0.01, "cosine")  # needs decay_steps
    with pytest.raises(ValueError):
        optimizers.build("ftrl", optimizers.make_schedule(
            0.01, "constant", warmup_steps=5))


def test_lazy_adam_accepts_schedule():
    """LazyAdam with a schedule: step 0 under warmup -> zero update even
    at nonzero-grad coordinates; later steps step normally."""
    sched = optimizers.make_schedule(0.01, "constant", warmup_steps=2)
    tx = optimizers.build("lazyadam", sched)
    p = {"w": jnp.asarray([1.0, 2.0])}
    st = tx.init(p)
    g = {"w": jnp.asarray([0.5, 0.0])}
    up, st = tx.update(g, st, p)
    np.testing.assert_allclose(np.asarray(up["w"]), [0.0, 0.0], atol=1e-9)
    up, st = tx.update(g, st, p)
    assert float(up["w"][0]) < 0.0      # warmup ramp engaged
    assert float(up["w"][1]) == 0.0     # lazy: untouched coordinate
