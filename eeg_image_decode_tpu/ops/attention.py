"""Fused channel-token attention layer as a Pallas TPU kernel.

Fuses the whole post-norm transformer layer of ATM-S (ref
``Transformer_EncDec.py:27-51`` + ``SelfAttention_Family.py:48-75,179-214``):

    QKV projections → 4-head softmax attention over the 64 channel tokens
    → output projection → residual → LayerNorm → conv-FFN → residual → LayerNorm

in one VMEM-resident kernel per batch tile: none of the Q/K/V/score/FFN
intermediates (≈ 0.6 GB per step at batch 1024) ever round-trips HBM. The
attention-layer share of the training step measured ~32% (scripts/
ablate_perf.py ablation) — this kernel targets it.

Scope: the fused path is mathematically exact w.r.t. the jnp reference with
dropout disabled; training with dropout>0 uses the XLA path (masks interior
to the fusion would have to cross the custom-VJP boundary). Gradients for the
fused path come from the XLA vjp of the identical reference math, so it is
usable in dropout-free training too.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def attention_layer_reference(x, params, masks=None, *, n_heads: int = 4):
    """jnp reference of the fused layer (fp32 softmax/LN, matmuls in x.dtype).

    ``params``: dict with wq,bq,wk,bk,wv,bv,wo,bo, ln1_s,ln1_b, w1,b1,w2,b2,
    ln2_s,ln2_b. Shapes follow the ATMS layer (D=d_model, inner=heads·hd).
    ``masks``: optional pre-scaled keep-masks (m_attn (B,H,L,L), m_res (B,L,D),
    m_ffn1 (B,L,FF), m_ffn2 (B,L,D)) — the layer's four dropout sites
    (ref ``Transformer_EncDec.py:36,45,48-49``) with Bernoulli/(1-p) values.
    """
    B, L, D = x.shape
    inner = params["wq"].shape[1]
    hd = inner // n_heads
    dt = x.dtype

    def dense(h, w, b):
        return (
            jnp.dot(h.reshape(-1, h.shape[-1]), w.astype(dt),
                    preferred_element_type=jnp.float32)
            .reshape(*h.shape[:-1], w.shape[1])
            .astype(dt)
            + b.astype(dt)
        )

    q = dense(x, params["wq"], params["bq"]).reshape(B, L, n_heads, hd)
    k = dense(x, params["wk"], params["bk"]).reshape(B, L, n_heads, hd)
    v = dense(x, params["wv"], params["bv"]).reshape(B, L, n_heads, hd)
    scores = jnp.einsum("blhe,bshe->bhls", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores / np.sqrt(hd), axis=-1).astype(dt)
    if masks is not None:
        probs = probs * masks["m_attn"].astype(dt)
    out = jnp.einsum("bhls,bshd->blhd", probs, v,
                     preferred_element_type=jnp.float32).astype(dt)
    out = dense(out.reshape(B, L, inner), params["wo"], params["bo"])
    if masks is not None:
        out = out * masks["m_res"].astype(dt)

    def ln(h, s, b):
        h32 = h.astype(jnp.float32)
        mu = h32.mean(-1, keepdims=True)
        var = h32.var(-1, keepdims=True)
        return ((h32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b).astype(dt)

    h = ln(x + out, params["ln1_s"], params["ln1_b"])
    y = dense(h, params["w1"], params["b1"])
    # tanh-gelu: Mosaic lowers neither erf nor erfc, so the fused path (and
    # this, its vjp twin) use the tanh approximation (|Δ| ≲ 1e-3)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(dt)
    if masks is not None:
        y = y * masks["m_ffn1"].astype(dt)
    y = dense(y, params["w2"], params["b2"])
    if masks is not None:
        y = y * masks["m_ffn2"].astype(dt)
    return ln(h + y, params["ln2_s"], params["ln2_b"])


def _kernel(x_ref, wq, bq, wk, bk, wv, bv, wo, bo, ln1_s, ln1_b,
            w1, b1, w2, b2, ln2_s, ln2_b, *rest, n_heads: int, bt: int,
            has_masks: bool):
    if has_masks:
        m_attn, m_res, m_ffn1, m_ffn2, o_ref = rest
    else:
        (o_ref,) = rest
    L = x_ref.shape[1]
    D = x_ref.shape[2]
    inner = wq.shape[1]
    hd = inner // n_heads
    dt = x_ref.dtype

    x = x_ref[:].reshape(bt * L, D)

    def dense(h, w_r, b_r):
        return (
            jnp.dot(h, w_r[:], preferred_element_type=jnp.float32).astype(dt)
            + b_r[:].astype(dt)
        )

    q = dense(x, wq, bq)
    k = dense(x, wk, bk)
    v = dense(x, wv, bv)

    heads = []
    scale = 1.0 / np.sqrt(hd)
    for h in range(n_heads):
        qh = q[:, h * hd : (h + 1) * hd].reshape(bt, L, hd)
        kh = k[:, h * hd : (h + 1) * hd].reshape(bt, L, hd)
        vh = v[:, h * hd : (h + 1) * hd].reshape(bt, L, hd)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bt, L, L)
        probs = jax.nn.softmax(scores * scale, axis=-1).astype(dt)
        if has_masks:
            probs = probs * m_attn[:, h].astype(dt)
        oh = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        heads.append(oh.reshape(bt * L, hd))
    attn = jnp.concatenate(heads, axis=1)
    attn = dense(attn, wo, bo)
    if has_masks:
        attn = attn * m_res[:].reshape(bt * L, D).astype(dt)

    def ln(h, s_r, b_r):
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mu), axis=-1, keepdims=True)
        return ((h32 - mu) * jax.lax.rsqrt(var + 1e-6) * s_r[:] + b_r[:]).astype(dt)

    h1 = ln(x + attn, ln1_s, ln1_b)
    y = dense(h1, w1, b1)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(dt)
    if has_masks:
        y = y * m_ffn1[:].reshape(bt * L, -1).astype(dt)
    y = dense(y, w2, b2)
    if has_masks:
        y = y * m_ffn2[:].reshape(bt * L, D).astype(dt)
    o_ref[:] = ln(h1 + y, ln2_s, ln2_b).reshape(bt, L, D)


_PARAM_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                "ln1_s", "ln1_b", "w1", "b1", "w2", "b2", "ln2_s", "ln2_b")


def _attention_pallas(x, params, masks, n_heads: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D = x.shape
    bt = 8
    n_blocks = -(-B // bt)
    pad = n_blocks * bt - B
    has_masks = masks is not None

    def pad0(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a

    x = pad0(x)
    flat = [jnp.asarray(params[k], x.dtype) for k in _PARAM_ORDER]

    def w_spec(arr):
        shape = arr.shape
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def batch_spec(arr):
        shape = (bt,) + arr.shape[1:]
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    mask_args, mask_specs = [], []
    if has_masks:
        for k in ("m_attn", "m_res", "m_ffn1", "m_ffn2"):
            m = pad0(jnp.asarray(masks[k], x.dtype))
            mask_args.append(m)
            mask_specs.append(batch_spec(m))

    out = pl.pallas_call(
        partial(_kernel, n_heads=n_heads, bt=bt, has_masks=has_masks),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [w_spec(a) for a in flat]
        + mask_specs,
        out_specs=pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, L, D), x.dtype),
        interpret=interpret,
    )(x, *flat, *mask_args)
    return out[:B]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_layer(x, params, masks=None, n_heads: int = 4,
                          interpret: bool = False):
    """Fused post-norm attention layer: (B, L, D) → (B, L, D).

    ``masks``: optional dict of pre-scaled dropout keep-masks (see
    ``attention_layer_reference``) applied inside the kernel — this is how
    train-mode dropout rides the fused path (masks are generated outside with
    the cheap RBG PRNG and shared with the backward pass)."""
    return _attention_pallas(x, params, masks, n_heads, interpret)


def _fwd(x, params, masks, n_heads, interpret):
    return (
        fused_attention_layer(x, params, masks, n_heads, interpret),
        (x, params, masks),
    )


def _bwd(n_heads, interpret, res, g):
    x, params, masks = res
    _, vjp = jax.vjp(
        lambda xx, pp: attention_layer_reference(
            xx, pp, masks, n_heads=n_heads
        ),
        x, params,
    )
    gx, gp = vjp(g)
    g_masks = (
        None if masks is None
        else jax.tree_util.tree_map(jnp.zeros_like, masks)
    )
    return gx, gp, g_masks


fused_attention_layer.defvjp(_fwd, _bwd)
