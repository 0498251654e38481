"""Embedding-gradient scatter lab: measure candidate replacements for the
XLA scatter floor (docs/ROADMAP.md) under realistic id/length distributions.

The sequence-feature backward is ``dtable = zeros(V, K).at[ids].add(g)``
with ids (B, T) valid-prefix padded (PAD = 0).  At WeChat shapes
(B=4096, T=50, V=106497->106752 padded, K=16) the synthetic/real 7-day
sequences are ~85-90% PAD — the scatter serially RMWs every entry anyway.
Variants here exploit PAD structure with static shapes:

  A  baseline: one full-N scatter (the round-1/2 floor)
  B  sort ids desc + while_loop over live chunks (PAD tail skipped;
     g rows gathered per-chunk by the sort order)
  C  sort batch rows by length + T-major while_loop: column t only
     scatters its first ceil(n_t/C)*C rows (n_t monotone decreasing)
  D  compact valid entries to a static CAP via searchsorted indexing +
     ONE CAP-sized scatter
  plus primitive rates: scatter-N sweep, sorts, row gathers.

Run: python benchmarks/scatter_lab.py  (on the TPU chip)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, K = 4096, 50, 16
V = 106752  # ROW_ALIGN-padded feedid table rows
GEOM_P = 0.15  # synthetic length distribution (data/synthetic.py)

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}  # trainer default


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    lens = np.minimum(rng.geometric(GEOM_P, size=(B,)), T).astype(np.int32)
    u = rng.random((B, T))
    ids = np.minimum(np.floor((V - 2) * u**2.0).astype(np.int32) + 1, V - 1)
    mask = np.arange(T)[None, :] < lens[:, None]
    ids = np.where(mask, ids, 0).astype(np.int32)
    g = rng.normal(size=(B, T, K)).astype(np.float32) * mask[:, :, None]
    return jnp.asarray(ids), jnp.asarray(g)


# ---- variants: (ids, g) -> dtable -----------------------------------------

def variant_a(ids, g):
    flat = ids.reshape(-1)
    return jnp.zeros((V, K), jnp.float32).at[flat].add(g.reshape(-1, K))


def variant_b(ids, g, chunk=8192):
    flat = ids.reshape(-1)
    gf = g.reshape(-1, K)
    order = jnp.argsort(-flat)  # desc: non-PAD first
    ids_s = flat[order]
    nonpad = jnp.sum(flat > 0)

    def cond(c):
        j, _ = c
        return j * chunk < nonpad

    def body(c):
        j, dt = c
        sl = jax.lax.dynamic_slice_in_dim(ids_s, j * chunk, chunk)
        idx = jax.lax.dynamic_slice_in_dim(order, j * chunk, chunk)
        gch = gf[idx] * (sl > 0)[:, None]
        return j + 1, dt.at[sl].add(gch)

    _, dt = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((V, K), jnp.float32))
    )
    return dt


def variant_c(ids, g, chunk=1024):
    lens = jnp.sum(ids > 0, axis=1)
    perm = jnp.argsort(-lens)
    ids_p = ids[perm]
    g_p = g[perm]
    n_t = jnp.sum(lens[None, :] > jnp.arange(T)[:, None], axis=1)  # (T,)

    def cond(s):
        t, _, _ = s
        return t < T

    def body(s):
        t, c, dt = s
        r0 = c * chunk
        idch = jax.lax.dynamic_slice(ids_p, (r0, t), (chunk, 1))[:, 0]
        gch = jax.lax.dynamic_slice(g_p, (r0, t, 0), (chunk, 1, K))[:, 0]
        gch = gch * (idch > 0)[:, None]
        dt = dt.at[idch].add(gch)
        c2 = c + 1
        done = c2 * chunk >= n_t[t]
        t2 = jnp.where(done, t + 1, t)
        # n_t is monotone nonincreasing: first empty column ends the walk
        t2 = jnp.where((t2 < T) & (n_t[jnp.minimum(t2, T - 1)] == 0), T, t2)
        return t2, jnp.where(done, 0, c2), dt

    t0 = jnp.where(n_t[0] == 0, T, 0)
    _, _, dt = jax.lax.while_loop(
        cond, body, (t0, jnp.int32(0), jnp.zeros((V, K), jnp.float32))
    )
    return dt


def variant_d(ids, g, cap=65536):
    lens = jnp.sum(ids > 0, axis=1)
    perm = jnp.argsort(-lens)
    ids_p = ids[perm]
    g_p = g[perm]
    n_t = jnp.sum(lens[None, :] > jnp.arange(T)[:, None], axis=1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(n_t).astype(jnp.int32)])
    j = jnp.arange(cap, dtype=jnp.int32)
    t_j = jnp.searchsorted(offsets, j, side="right") - 1
    t_j = jnp.minimum(t_j, T - 1)
    r_j = j - offsets[t_j]
    valid = j < offsets[-1]
    idv = jnp.where(valid, ids_p[r_j, t_j], 0)
    gv = g_p[r_j, t_j, :] * valid[:, None]
    return jnp.zeros((V, K), jnp.float32).at[idv].add(gv)


# ---- primitive rates -------------------------------------------------------

def scatter_n(ids, g, n):
    flat = ids.reshape(-1)[:n]
    return jnp.zeros((V, K), jnp.float32).at[flat].add(g.reshape(-1, K)[:n])


def gather_rows(ids, g):  # 64B-row gather, full N
    return g.reshape(-1, K)[jnp.argsort(-ids.reshape(-1))]


def gather_batch(ids, g):  # 3200B-row batch gather
    return g[jnp.argsort(-jnp.sum(ids > 0, axis=1))]


def sort_only(ids, g):
    return jnp.sort(ids.reshape(-1)).astype(jnp.float32)[:, None] * jnp.ones((1, K))


# ---- timing ----------------------------------------------------------------

def time_variant(fn, ids, g, k_small=8, k_big=40, repeats=3):
    """K-step slope timing with a carried dependence (no hoisting)."""

    def make(k):
        @functools.partial(jax.jit, donate_argnums=(0,),
                           compiler_options=OPTS)
        def run(acc, ids, g):
            def body(i, acc):
                out = fn(ids, g + (1e-30 * acc[0, 0]))
                out2d = out.reshape(-1, out.shape[-1])
                return out2d[: acc.shape[0], : acc.shape[1]] + acc * 0.0

            acc = jax.lax.fori_loop(0, k, body, acc)
            return acc, acc[0, 0]

        return run

    runs = {k: make(k) for k in (k_small, k_big)}
    times = {}
    for k, run in runs.items():
        acc = jnp.zeros((8, K), jnp.float32)
        acc, loss = run(acc, ids, g)
        float(loss)
        ts = []
        for _ in range(repeats + 1):
            acc = jnp.zeros((8, K), jnp.float32)
            t0 = time.perf_counter()
            acc, loss = run(acc, ids, g)
            float(loss)
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts[1:])
        times[k] = ts[len(ts) // 2]
    return (times[k_big] - times[k_small]) / (k_big - k_small) * 1e6


def variant_e(ids, g):
    """The production path: ops/compact_scatter.scatter_grad (cond ladder)."""
    from recalgorithm_tpu.ops.compact_scatter import scatter_grad

    return scatter_grad(ids, g, V)


def variant_f(ids, g):
    """Production _compact_scatter direct: fixed cap, flat gathers, no cond."""
    from recalgorithm_tpu.ops.compact_scatter import _compact_scatter

    return _compact_scatter(ids, g, V, ids.size // 4)


def _off(ids):
    lens = jnp.max(jnp.where(
        ids > 0, jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) + 1, 0
    ), axis=1)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens).astype(jnp.int32)])


def searchsorted_bench(method):
    def fn(ids, g):
        off = _off(ids)
        j = jnp.arange(ids.size // 4, dtype=jnp.int32)
        b = jnp.searchsorted(off, j, side="right", method=method) - 1
        return (b[:, None] * jnp.ones((1, K)))  # 2-D for the harness
    return fn


def gather_cap_rows(ids, g):
    """Flat row-gather of cap rows from the (B*T, K) cotangent."""
    cap = ids.size // 4
    idx = (jnp.arange(cap, dtype=jnp.int32) * 3) % ids.size
    return g.reshape(-1, K)[idx]


def scatter_cap(ids, g):
    cap = ids.size // 4
    flat = ids.reshape(-1)[:cap]
    return jnp.zeros((V, K), jnp.float32).at[flat].add(g.reshape(-1, K)[:cap])


BENCHES = {
    "A_full_scatter": variant_a,
    "B_sortdesc_chunks": variant_b,
    "C_lensort_tmajor": variant_c,
    "D_compact_cap": variant_d,
    "E_prod_ladder": variant_e,
    "F_compact_nocond": variant_f,
    "searchsorted_scan": searchsorted_bench("scan"),
    "searchsorted_unrolled": searchsorted_bench("scan_unrolled"),
    "searchsorted_sort": searchsorted_bench("sort"),
    "searchsorted_compare_all": searchsorted_bench("compare_all"),
    "gather_cap_rows": gather_cap_rows,
    "scatter_cap": scatter_cap,
    "gather_rows_64B": gather_rows,
    "gather_batch_3200B": gather_batch,
    "sort_204800": sort_only,
}
for _n in (16384, 32768, 65536, 131072, 204800):
    BENCHES[f"scatter_{_n}"] = functools.partial(scatter_n, n=_n)


def main():
    names = sys.argv[1:] or list(BENCHES)
    ids, g = make_inputs()
    nonpad = int(jnp.sum(ids > 0))
    print(f"B={B} T={T} K={K} V={V} nonpad={nonpad} "
          f"({100 * nonpad / (B * T):.1f}% density)", file=sys.stderr, flush=True)

    ref = None
    results = {}
    for name in names:
        fn = BENCHES[name]
        if name[0] in "ABCDEF":  # correctness vs the full scatter
            if ref is None:
                ref = np.asarray(jax.jit(variant_a)(ids, g))
            got = np.asarray(jax.jit(fn, compiler_options=OPTS)(ids, g))
            err = float(np.max(np.abs(got - ref)))
            assert err < 1e-3, (name, err)
        us = time_variant(fn, ids, g)
        results[name] = round(us, 1)
        print(f"{name}: {us:.1f} us", file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
