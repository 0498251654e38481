"""Fully-fused BST transformer block: one Pallas kernel per pass.

STATUS — measured SLOWER than the fused-core path on v5e; kept as a correct,
tested negative result.  Honest slope timing of the full BST step at batch
4096: XLA block 13.2ms, fused attention core (bst_attention.py) 11.5ms, this
whole-block kernel 18.0ms.  The attention core vectorises over T via
(T, d, TB) reshapes, but the projections / W_o / LN / FFN here run as per-t
fori loops over (16, 128) tiles — two vregs of work per op — and loop/issue
overhead dominates.  A faster variant needs the feature dim on sublanes and
T*B on lanes for the pointwise chain, which costs lane<->sublane transposes
around the attention core that eat the gains at d=16.

Motivation (still open): with the core fused, the rest of the block costs
~4-5ms per step *inside the full model* even though the same block measured
in isolation costs ~1.4ms — XLA's layout/scheduling choices for the
(B, T, 16) chain degrade in the full-graph context, and neither remat,
optimization barriers, nor 2-D matmul reformulations recover it.

Math (identical to ops.attention.BSTTransformerBlock, reference
transformer_layer.py:6-81 with the key-axis mask fix):

    y   = x + pos
    q_h = y Wq_h ; k_h = y Wk_h ; v_h = x Wv_h            (h = 1..H)
    s_h = softmax(mask_keys(q_h k_h^T / sqrt(d))) v_h
    o   = concat_h(s_h) W_o
    n1  = LN1(o + x)                                       (eps 1e-6)
    f   = leakyrelu(n1 Wf + bf)                            (abs-trick, leak .01)
    out = LN2(f + n1)

Backward is hand-derived and grid-accumulates the weight gradients (the TPU
grid is sequential, so `@pl.when(program_id==0)` zero-init + `+=` is exact).
Forward activations are recomputed in the backward kernel from x (flash
pattern); nothing but x / lengths is saved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(2.0**32) + 1
LN_EPS = 1e-6
LEAK = 0.01
_F1 = 0.5 * (1 + LEAK)
_F2 = 0.5 * (1 - LEAK)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b for (d, X) operands -> (d_a2?, ...): contract axis 0 of both."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _outer_lanes(a, b):
    """(d1, TB) x (d2, TB) -> (d1, d2), contracting the lane (batch) axis."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _layer_norm(r, g, b):
    mu = jnp.mean(r, axis=0, keepdims=True)
    xc = r - mu
    var = jnp.mean(xc * xc, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * inv
    return g * xhat + b, xhat, inv


def _layer_norm_bwd(dz, g, xhat, inv, d):
    """Returns (dr, dgamma_partial, dbeta_partial)."""
    dg = jnp.sum(dz * xhat, axis=1, keepdims=True)  # (d, 1)
    db = jnp.sum(dz, axis=1, keepdims=True)
    dxhat = dz * g
    m1 = jnp.mean(dxhat, axis=0, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dr = inv * (dxhat - m1 - xhat * m2)
    return dr, dg, db


def _attn_row(q_s, k3, len_col, i, t, d, scale):
    qi = q_s[pl.ds(i * d, d), :]
    lij = jnp.sum(k3 * qi[None, :, :], axis=1) * scale  # (T, TB)
    jidx = jax.lax.broadcasted_iota(jnp.int32, lij.shape, 0)
    lij = jnp.where(jidx < len_col, lij, NEG_INF)
    m = jnp.max(lij, axis=0, keepdims=True)
    p = jnp.exp(lij - m)
    s = jnp.sum(p, axis=0, keepdims=True)
    return qi, p / jnp.maximum(s, 1e-30)


def _project_head(h, wq_ref, wk_ref, wv_ref, x_ref, y_s, q_s, k_s, v_s, t, d):
    wq, wk, wv = wq_ref[h], wk_ref[h], wv_ref[h]  # (d, d) each, [j, k]

    def body(ti, _):
        sl = pl.ds(ti * d, d)
        yt = y_s[sl, :]
        q_s[sl, :] = _dot(wq, yt)
        k_s[sl, :] = _dot(wk, yt)
        v_s[sl, :] = _dot(wv, x_ref[sl, :])
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def _fwd_o_acc(
    x_ref, len_ref, pos_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    y_s, q_s, k_s, v_s, o_s, *, t, d, nh,
):
    """Shared forward section: fills y_s and o_s (= concat_h(s_h) W_o)."""
    y_s[:] = x_ref[:] + pos_ref[:]
    o_s[:] = jnp.zeros_like(o_s)
    scale = 1.0 / (d**0.5)
    len_col = len_ref[:]
    for h in range(nh):
        _project_head(h, wq_ref, wk_ref, wv_ref, x_ref, y_s, q_s, k_s, v_s, t, d)
        k3 = k_s[:].reshape(t, d, y_s.shape[1])
        v3 = v_s[:].reshape(t, d, y_s.shape[1])
        woh = wo_ref[:, h * d : (h + 1) * d]  # (d, d) slice of W_o^T

        def body(i, _):
            _, attn = _attn_row(q_s, k3, len_col, i, t, d, scale)
            si = jnp.sum(attn[:, None, :] * v3, axis=0)  # (d, TB)
            sl = pl.ds(i * d, d)
            o_s[sl, :] += _dot(woh, si)
            return 0

        jax.lax.fori_loop(0, t, body, 0)


def _ffn_ln_fwd(x_ref, o_s, g1_ref, b1_ref, g2_ref, b2_ref, wf_ref, bf_ref,
                out_ref, *, t, d):
    def body(ti, _):
        sl = pl.ds(ti * d, d)
        r = o_s[sl, :] + x_ref[sl, :]
        n1, _, _ = _layer_norm(r, g1_ref[:], b1_ref[:])
        z = _dot(wf_ref[:], n1) + bf_ref[:]
        f = _F1 * z + _F2 * jnp.abs(z)
        r2 = f + n1
        out, _, _ = _layer_norm(r2, g2_ref[:], b2_ref[:])
        out_ref[sl, :] = out
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def _fwd_kernel(
    x_ref, len_ref, pos_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    g1_ref, b1_ref, wf_ref, bf_ref, g2_ref, b2_ref,
    out_ref,
    y_s, q_s, k_s, v_s, o_s,
    *, t, d, nh,
):
    _fwd_o_acc(x_ref, len_ref, pos_ref, wq_ref, wk_ref, wv_ref, wo_ref,
               y_s, q_s, k_s, v_s, o_s, t=t, d=d, nh=nh)
    _ffn_ln_fwd(x_ref, o_s, g1_ref, b1_ref, g2_ref, b2_ref, wf_ref, bf_ref,
                out_ref, t=t, d=d)


def _bwd_kernel(
    x_ref, len_ref, dout_ref,
    pos_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    g1_ref, b1_ref, wf_ref, bf_ref, g2_ref, b2_ref,
    # outputs
    dx_ref, dpos_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
    dg1_ref, db1_ref, dwf_ref, dbf_ref, dg2_ref, db2_ref,
    # scratch
    y_s, q_s, k_s, v_s, o_s, do_s, dx_s, dy_s, dk_s, dv_s,
    *, t, d, nh,
):
    tb = y_s.shape[1]
    scale = 1.0 / (d**0.5)
    len_col = len_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dpos_ref[:] = jnp.zeros_like(dpos_ref)
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)
        dbf_ref[:] = jnp.zeros_like(dbf_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # pass 1: recompute y and o (= concat_h(s_h) W_o)
    _fwd_o_acc(x_ref, len_ref, pos_ref, wq_ref, wk_ref, wv_ref, wo_ref,
               y_s, q_s, k_s, v_s, o_s, t=t, d=d, nh=nh)

    # pass 2: LN2/FFN/LN1 backward per time step -> do_s (grad wrt o),
    # dx_s gets the LN1 residual branch.
    def bwd_tail(ti, carry):
        dg1a, db1a, dg2a, db2a, dwfa, dbfa = carry
        sl = pl.ds(ti * d, d)
        r = o_s[sl, :] + x_ref[sl, :]
        n1, xhat1, inv1 = _layer_norm(r, g1_ref[:], b1_ref[:])
        z = _dot(wf_ref[:], n1) + bf_ref[:]
        f = _F1 * z + _F2 * jnp.abs(z)
        r2 = f + n1
        _, xhat2, inv2 = _layer_norm(r2, g2_ref[:], b2_ref[:])

        dout = dout_ref[sl, :]
        dr2, dg2p, db2p = _layer_norm_bwd(dout, g2_ref[:], xhat2, inv2, d)
        dz = dr2 * (_F1 + _F2 * jnp.sign(z))
        dn1 = dr2 + _dot_t(wf_ref[:], dz)
        dwfp = _outer_lanes(dz, n1)  # (d, d) = d(WfT)
        dbfp = jnp.sum(dz, axis=1, keepdims=True)
        dr, dg1p, db1p = _layer_norm_bwd(dn1, g1_ref[:], xhat1, inv1, d)
        do_s[sl, :] = dr
        dx_s[sl, :] = dr  # residual o + x
        return (dg1a + dg1p, db1a + db1p, dg2a + dg2p, db2a + db2p,
                dwfa + dwfp, dbfa + dbfp)

    zcol = jnp.zeros((d, 1), jnp.float32)
    zmat = jnp.zeros((d, d), jnp.float32)
    dg1, db1, dg2, db2, dwf, dbf = jax.lax.fori_loop(
        0, t, bwd_tail, (zcol, zcol, zcol, zcol, zmat, zcol)
    )
    dg1_ref[:] += dg1
    db1_ref[:] += db1
    dg2_ref[:] += dg2
    db2_ref[:] += db2
    dwf_ref[:] += dwf
    dbf_ref[:] += dbf

    # pass 3: per head — recompute q/k/v and attention, backprop through
    # W_o, attention, projections.  dy_s / remaining dx accumulated.
    dy_s[:] = jnp.zeros_like(dy_s)
    for h in range(nh):
        _project_head(h, wq_ref, wk_ref, wv_ref, x_ref, y_s, q_s, k_s, v_s, t, d)
        k3 = k_s[:].reshape(t, d, tb)
        v3 = v_s[:].reshape(t, d, tb)
        woh = wo_ref[:, h * d : (h + 1) * d]

        def body(i, carry):
            dk3, dv3, dwoh, dwqh, dwkh, dwvh = carry
            qi, attn = _attn_row(q_s, k3, len_col, i, t, d, scale)
            si = jnp.sum(attn[:, None, :] * v3, axis=0)
            sl = pl.ds(i * d, d)
            do_i = do_s[sl, :]
            dwoh = dwoh + _outer_lanes(do_i, si)  # d(WoT slice)
            ds_i = _dot_t(woh, do_i)  # (d, TB) grad wrt s_h[i]
            # attention backward for row i
            dv3 = dv3 + attn[:, None, :] * ds_i[None, :, :]
            dp = jnp.sum(v3 * ds_i[None, :, :], axis=1)  # (T, TB)
            dsum = jnp.sum(dp * attn, axis=0, keepdims=True)
            dl = attn * (dp - dsum) * scale
            dq_i = jnp.sum(k3 * dl[:, None, :], axis=0)  # (d, TB)
            dk3 = dk3 + dl[:, None, :] * qi[None, :, :]
            # projections backward for the query row (q depends on y_t=i)
            yt = y_s[sl, :]
            dwqh = dwqh + _outer_lanes(dq_i, yt)
            dy_s[sl, :] += _dot_t(wq_ref[h], dq_i)
            return dk3, dv3, dwoh, dwqh, dwkh, dwvh

        z3 = jnp.zeros((t, d, tb), jnp.float32)
        dk3, dv3, dwoh, dwqh, dwkh, dwvh = jax.lax.fori_loop(
            0, t, body, (z3, z3, zmat, zmat, zmat, zmat)
        )
        dwo_ref[:, h * d : (h + 1) * d] += dwoh
        dwq_ref[h] += dwqh
        # stage dk/dv in scratch: Mosaic cannot dynamic-slice loop-carried
        # values, only refs
        dk_s[:] = dk3.reshape(t * d, tb)
        dv_s[:] = dv3.reshape(t * d, tb)

        # k / v projections backward (grads now summed over query rows)
        def body2(ti, carry):
            dwkh, dwvh = carry
            sl = pl.ds(ti * d, d)
            dk_t = dk_s[sl, :]
            dv_t = dv_s[sl, :]
            yt = y_s[sl, :]
            xt = x_ref[sl, :]
            dwkh = dwkh + _outer_lanes(dk_t, yt)
            dwvh = dwvh + _outer_lanes(dv_t, xt)
            dy_s[sl, :] += _dot_t(wk_ref[h], dk_t)
            dx_s[sl, :] += _dot_t(wv_ref[h], dv_t)
            return dwkh, dwvh

        dwkh, dwvh = jax.lax.fori_loop(0, t, body2, (zmat, zmat))
        dwk_ref[h] += dwkh
        dwv_ref[h] += dwvh

    # pass 4: pos grad = lane-sum of dy; dx = dx_s + dy_s (y = x + pos)
    dpos_ref[:] += jnp.sum(dy_s[:], axis=1, keepdims=True)
    dx_ref[:] = dx_s[:] + dy_s[:]


def _to_tlayout(x):
    """(B, T, d) -> (T*d, B)."""
    b, t, d = x.shape
    return x.transpose(1, 2, 0).reshape(t * d, b)


def _from_tlayout(x, b, t, d):
    return x.reshape(t, d, b).transpose(2, 0, 1)


def _prep_params(params, t, d, nh):
    pos = params["position_embedding"][:t].reshape(t * d, 1)
    wq = jnp.swapaxes(params["w_q"], 1, 2)  # (H, j, k)
    wk = jnp.swapaxes(params["w_k"], 1, 2)
    wv = jnp.swapaxes(params["w_v"], 1, 2)
    wo = params["w_o"].T  # (d, H*d)
    g1 = params["ln1"]["scale"].reshape(d, 1)
    b1 = params["ln1"]["bias"].reshape(d, 1)
    wf = params["ffn"]["kernel"].T  # (d, d) WfT
    bf = params["ffn"]["bias"].reshape(d, 1)
    g2 = params["ln2"]["scale"].reshape(d, 1)
    b2 = params["ln2"]["bias"].reshape(d, 1)
    return pos, wq, wk, wv, wo, g1, b1, wf, bf, g2, b2


def _tile(b):
    if b % 128:
        raise ValueError(f"batch {b} must be a multiple of 128")
    return 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bst_block_core(
    x: jax.Array,        # (B, T, d) f32
    lengths: jax.Array,  # (B,) int32, incl. the target slot
    params: dict,        # BSTTransformerBlock param tree (position_embedding,
                         # w_q/w_k/w_v/w_o, ln1, ffn, ln2)
    num_heads: int,
    max_length: int,     # unused in math; kept for signature clarity
    interpret: bool = False,
) -> jax.Array:
    b, t, d = x.shape
    tb = _tile(b)
    xT = _to_tlayout(x)
    lenT = lengths[None, :].astype(jnp.int32)
    prep = _prep_params(params, t, d, num_heads)

    io_spec = pl.BlockSpec((t * d, tb), lambda i: (0, i))
    len_spec = pl.BlockSpec((1, tb), lambda i: (0, i))
    p_specs = [
        pl.BlockSpec(p.shape, lambda i, n=p.ndim: (0,) * n) for p in prep
    ]

    scratch = [pltpu.VMEM((t * d, tb), jnp.float32) for _ in range(5)]

    outT = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t, d=d, nh=num_heads),
        grid=(b // tb,),
        in_specs=[io_spec, len_spec] + p_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((t * d, b), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xT, lenT, *prep)
    return _from_tlayout(outT, b, t, d)


def _blk_fwd(x, lengths, params, num_heads, max_length, interpret):
    out = _bst_block_core(x, lengths, params, num_heads, max_length, interpret)
    return out, (x, lengths, params)


def _blk_bwd(num_heads, max_length, interpret, res, g):
    x, lengths, params = res
    b, t, d = x.shape
    tb = _tile(b)
    xT = _to_tlayout(x)
    gT = _to_tlayout(g)
    lenT = lengths[None, :].astype(jnp.int32)
    prep = _prep_params(params, t, d, num_heads)
    pos, wq, wk, wv, wo, g1, b1, wf, bf, g2, b2 = prep

    io_spec = pl.BlockSpec((t * d, tb), lambda i: (0, i))
    len_spec = pl.BlockSpec((1, tb), lambda i: (0, i))
    p_specs = [
        pl.BlockSpec(p.shape, lambda i, n=p.ndim: (0,) * n) for p in prep
    ]
    acc_spec = lambda p: pl.BlockSpec(p.shape, lambda i: (0,) * p.ndim)

    out_shapes = (
        jax.ShapeDtypeStruct((t * d, b), jnp.float32),   # dx
        jax.ShapeDtypeStruct(pos.shape, jnp.float32),     # dpos
        jax.ShapeDtypeStruct(wq.shape, jnp.float32),
        jax.ShapeDtypeStruct(wk.shape, jnp.float32),
        jax.ShapeDtypeStruct(wv.shape, jnp.float32),
        jax.ShapeDtypeStruct(wo.shape, jnp.float32),
        jax.ShapeDtypeStruct(g1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(wf.shape, jnp.float32),
        jax.ShapeDtypeStruct(bf.shape, jnp.float32),
        jax.ShapeDtypeStruct(g2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
    )
    out_specs = (io_spec,) + tuple(
        acc_spec(p) for p in (pos, wq, wk, wv, wo, g1, b1, wf, bf, g2, b2)
    )
    scratch = [pltpu.VMEM((t * d, tb), jnp.float32) for _ in range(10)]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, t=t, d=d, nh=num_heads),
        grid=(b // tb,),
        in_specs=[io_spec, len_spec, io_spec] + p_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(xT, lenT, gT, *prep)
    (dxT, dpos, dwq, dwk, dwv, dwo, dg1, db1, dwf, dbf, dg2, db2) = outs

    dx = _from_tlayout(dxT, b, t, d)
    dparams = {
        "position_embedding": jnp.zeros_like(params["position_embedding"])
        .at[: t]
        .set(dpos.reshape(t, d)),
        "w_q": jnp.swapaxes(dwq, 1, 2),
        "w_k": jnp.swapaxes(dwk, 1, 2),
        "w_v": jnp.swapaxes(dwv, 1, 2),
        "w_o": dwo.T,
        "ln1": {"scale": dg1[:, 0], "bias": db1[:, 0]},
        "ffn": {"kernel": dwf.T, "bias": dbf[:, 0]},
        "ln2": {"scale": dg2[:, 0], "bias": db2[:, 0]},
    }
    return dx, None, dparams


_bst_block_core.defvjp(_blk_fwd, _blk_bwd)


def bst_block_fused(
    x: jax.Array,        # (B, T, d) f32
    lengths: jax.Array,  # (B,) int32, incl. the target slot
    params: dict,
    num_heads: int,
    max_length: int,
    interpret: bool = False,
) -> jax.Array:
    """Whole-block fused BST for any batch size (zero-pads B to 128 lanes)."""
    b = x.shape[0]
    pad = (-b) % 128
    if pad == 0:
        return _bst_block_core(x, lengths, params, num_heads, max_length,
                               interpret)
    x_p = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    len_p = jnp.pad(lengths, (0, pad), constant_values=1)
    out = _bst_block_core(x_p, len_p, params, num_heads, max_length, interpret)
    return out[:b]
