"""Fused channel-token attention layer as a Pallas TPU kernel.

Fuses the whole post-norm transformer layer of ATM-S (ref
``Transformer_EncDec.py:27-51`` + ``SelfAttention_Family.py:48-75,179-214``):

    QKV projections → 4-head softmax attention over the 64 channel tokens
    → output projection → residual → LayerNorm → conv-FFN → residual → LayerNorm

in one VMEM-resident kernel per batch tile: none of the Q/K/V/score/FFN
intermediates (≈ 0.6 GB per step at batch 1024) ever round-trips HBM. The
attention-layer share of the training step measured ~32% (scripts/
ablate_perf.py ablation) — this kernel targets it.

Both directions are Pallas: the forward kernel plus a native backward
(``_bwd_kernel``) that recomputes the forward inside VMEM (flash-style remat)
and accumulates fp32 parameter grads across sequential grid steps. Dropout
rides the fused path as pre-scaled keep-masks generated outside (cheap RBG
PRNG) and applied inside both kernels — so the full training step is fused
(measured: 36.0k → 45.9k samples/s on the flagship bench). Gradients match
the XLA vjp of the identical reference math to within XLA's own
default-precision noise; ``_bwd_xla`` remains as the cross-check path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# Batch-tile rows per grid step, tuned on v5e with scripts/bench_attention.py
# per MODE: the training path (in-kernel PRNG dropout, fwd+bwd) wins at 16
# (flagship B=1024 fwd+bwd: bt=8 2.81 ms, 16 2.52, 32 2.87, 64 2.47 — 16
# taken, within noise of 64 at a quarter of the VMEM/compile). The
# dropout-free forward keeps 8: a readback-synced interleaved A/B of the
# full 66160-sample extraction (tile 8: 350/355/342k samples/s, tile 16:
# 359/350/353k) shows the two within noise, so the smaller tile stays for
# its lower VMEM footprint. fp32 halves the tile.
BLOCK_BT_TRAIN_BF16 = 16
BLOCK_BT_EVAL_BF16 = 8
BLOCK_BT_FP32 = 4


def _block_bt(dtype, training: bool) -> int:
    if dtype != jnp.bfloat16:
        return BLOCK_BT_FP32
    return BLOCK_BT_TRAIN_BF16 if training else BLOCK_BT_EVAL_BF16


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


def _draw_keep_masks(seed_ref, dropout_p, n_heads, bt, L, D, FF):
    """In-kernel mask generation. Each mask RE-SEEDS the PRNG with its own
    salt: the hardware PRNG is stateful and draws without data dependence
    could be scheduled in different orders by the fwd and bwd compilations —
    per-draw seeding makes every mask a pure function of (seed, grid position,
    salt), so both kernels reproduce identical masks with zero HBM traffic.
    Masks are fp32 (callers cast at the multiply site)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    base = seed_ref[0, 0] * 131 + pl.program_id(0) * 16
    keep = 1.0 - dropout_p
    thresh = np.uint32(int(keep * 0xFFFFFFFF))
    inv_keep = np.float32(1.0 / keep)

    def draw(shape, salt):
        pltpu.prng_seed(base + salt)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return jnp.where(bits < thresh, inv_keep, np.float32(0.0))

    m_attn = [draw((bt, L, L), h) for h in range(n_heads)]
    m_res = draw((bt * L, D), n_heads)
    m_ffn1 = draw((bt * L, FF), n_heads + 1)
    m_ffn2 = draw((bt * L, D), n_heads + 2)
    return m_attn, m_res, m_ffn1, m_ffn2


def _kernel(x_ref, wq, bq, wk, bk, wv, bv, wo, bo, ln1_s, ln1_b,
            w1, b1, w2, b2, ln2_s, ln2_b, *rest, n_heads: int, bt: int,
            has_masks: bool, dropout_p: float = 0.0):
    has_seed = dropout_p > 0.0 and not has_masks
    if has_masks:
        m_attn_r, m_res_r, m_ffn1_r, m_ffn2_r, o_ref = rest
    elif has_seed:
        seed_ref, o_ref = rest
    else:
        (o_ref,) = rest
    L = x_ref.shape[1]
    D = x_ref.shape[2]
    inner = wq.shape[1]
    FF = w1.shape[1]
    hd = inner // n_heads
    dt = x_ref.dtype

    use_drop = has_masks or has_seed
    if has_masks:
        ma = m_attn_r[:]
        m_attn = [ma[:, h].astype(dt) for h in range(n_heads)]
        m_res = m_res_r[:].reshape(bt * L, D).astype(dt)
        m_ffn1 = m_ffn1_r[:].reshape(bt * L, FF).astype(dt)
        m_ffn2 = m_ffn2_r[:].reshape(bt * L, D).astype(dt)
    elif has_seed:
        ma_l, mr_d, mf1_d, mf2_d = _draw_keep_masks(
            seed_ref, dropout_p, n_heads, bt, L, D, FF
        )
        m_attn = [m.astype(dt) for m in ma_l]
        m_res = mr_d.astype(dt)
        m_ffn1 = mf1_d.astype(dt)
        m_ffn2 = mf2_d.astype(dt)

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
        if use_drop:
            probs = probs * m_attn[h]
        oh = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        heads.append(oh.reshape(bt * L, hd))
    attn = jnp.concatenate(heads, axis=1)
    attn = dense(attn, wo, bo)
    if use_drop:
        attn = attn * m_res

    def ln(h, s_r, b_r):
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mu), axis=-1, keepdims=True)
        return ((h32 - mu) * jax.lax.rsqrt(var + 1e-6) * s_r[:] + b_r[:]).astype(dt)

    h1 = ln(x + attn, ln1_s, ln1_b)
    y = dense(h1, w1, b1)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(dt)
    if use_drop:
        y = y * m_ffn1
    y = dense(y, w2, b2)
    if use_drop:
        y = y * m_ffn2
    o_ref[:] = ln(h1 + y, ln2_s, ln2_b).reshape(bt, L, D)


_PARAM_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                "ln1_s", "ln1_b", "w1", "b1", "w2", "b2", "ln2_s", "ln2_b")


def _seed_arg_and_spec(seed, pl, pltpu):
    s = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return s, spec


def _attention_pallas(x, params, masks, n_heads: int, interpret: bool,
                      dropout_p: float = 0.0, seed=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D = x.shape
    has_masks = masks is not None
    has_seed = dropout_p > 0.0 and seed is not None and not has_masks
    bt = _block_bt(x.dtype, training=has_masks or has_seed)
    n_blocks = -(-B // bt)
    pad = n_blocks * bt - B

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

    extra_args, extra_specs = [], []
    if has_masks:
        for k in ("m_attn", "m_res", "m_ffn1", "m_ffn2"):
            m = pad0(jnp.asarray(masks[k], x.dtype))
            extra_args.append(m)
            extra_specs.append(batch_spec(m))
    elif has_seed:
        s, spec = _seed_arg_and_spec(seed, pl, pltpu)
        extra_args.append(s)
        extra_specs.append(spec)

    out = pl.pallas_call(
        partial(_kernel, n_heads=n_heads, bt=bt, has_masks=has_masks,
                dropout_p=dropout_p if has_seed else 0.0),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [w_spec(a) for a in flat]
        + extra_specs,
        out_specs=pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, L, D), x.dtype),
        # larger batch tiles need more than the default 16M scoped VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *flat, *extra_args)
    return out[:B]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_layer(x, params, masks=None, n_heads: int = 4,
                          interpret: bool = False, dropout_p: float = 0.0,
                          seed=None):
    """Fused post-norm attention layer: (B, L, D) → (B, L, D).

    Dropout, two ways:
    - ``masks``: explicit pre-scaled keep-mask dict (see
      ``attention_layer_reference``) — used by the XLA-comparison tests.
    - ``dropout_p`` + ``seed`` (scalar int32): masks are drawn INSIDE the
      kernel with the TPU hardware PRNG, and the backward kernel re-seeds
      identically so fwd/bwd agree — zero mask HBM traffic. This is the
      training path."""
    return _attention_pallas(x, params, masks, n_heads, interpret,
                             dropout_p, seed)


def _fwd(x, params, masks, n_heads, interpret, dropout_p, seed):
    return (
        fused_attention_layer(x, params, masks, n_heads, interpret,
                              dropout_p, seed),
        (x, params, masks, seed),
    )


def _bwd(n_heads, interpret, dropout_p, res, g):
    x, params, masks, seed = res
    gx, gp = _attention_pallas_bwd(x, params, masks, g, n_heads, interpret,
                                   dropout_p, seed)
    g_masks = (
        None if masks is None
        else jax.tree_util.tree_map(jnp.zeros_like, masks)
    )
    return gx, gp, g_masks, None


def _bwd_xla(n_heads, interpret, dropout_p, res, g):
    """Reference backward (XLA vjp of the reference forward) — kept for
    numerical cross-checks of the native Pallas backward (mask mode only)."""
    x, params, masks, _ = res
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
    return gx, gp, g_masks, None


fused_attention_layer.defvjp(_fwd, _bwd)


# ————————————————————————————————————————————————————————————————————————
# Native Pallas backward: recomputes the forward inside the kernel (VMEM
# remat — nothing round-trips HBM) and accumulates fp32 parameter grads
# across grid steps into shared output blocks. This is what lets training
# run the fused layer: the generic custom-VJP route would re-run the XLA
# forward for residuals and give the fusion win back.
# ————————————————————————————————————————————————————————————————————————


def _gelu_tanh_and_grad(u32):
    c = np.float32(np.sqrt(2.0 / np.pi))
    a = np.float32(0.044715)
    inner = c * (u32 + a * u32 * u32 * u32)
    t = jnp.tanh(inner)
    g = 0.5 * u32 * (1.0 + t)
    dg = 0.5 * (1.0 + t) + 0.5 * u32 * (1.0 - t * t) * c * (
        1.0 + 3.0 * a * u32 * u32
    )
    return g, dg


def _bwd_kernel(x_ref, wq, bq, wk, bk, wv, bv, wo, bo, ln1_s, ln1_b,
                w1, b1, w2, b2, ln2_s, ln2_b, *rest,
                n_heads: int, bt: int, has_masks: bool,
                dropout_p: float = 0.0):
    has_seed = dropout_p > 0.0 and not has_masks
    if has_masks:
        (m_attn_r, m_res_r, m_ffn1_r, m_ffn2_r, g_ref,
         dx_ref, dwq_r, dbq_r, dwk_r, dbk_r, dwv_r, dbv_r, dwo_r, dbo_r,
         dln1s_r, dln1b_r, dw1_r, db1_r, dw2_r, db2_r, dln2s_r, dln2b_r) = rest
    elif has_seed:
        (seed_ref, g_ref,
         dx_ref, dwq_r, dbq_r, dwk_r, dbk_r, dwv_r, dbv_r, dwo_r, dbo_r,
         dln1s_r, dln1b_r, dw1_r, db1_r, dw2_r, db2_r, dln2s_r, dln2b_r) = rest
    else:
        (g_ref,
         dx_ref, dwq_r, dbq_r, dwk_r, dbk_r, dwv_r, dbv_r, dwo_r, dbo_r,
         dln1s_r, dln1b_r, dw1_r, db1_r, dw2_r, db2_r, dln2s_r, dln2b_r) = rest

    import jax.experimental.pallas as pl

    L = x_ref.shape[1]
    D = x_ref.shape[2]
    inner = wq.shape[1]
    FF = w1.shape[1]
    hd = inner // n_heads
    dt = x_ref.dtype
    N = bt * L

    use_drop = has_masks or has_seed
    if has_masks:
        ma_all = m_attn_r[:]
        masks_attn = [ma_all[:, h].astype(jnp.float32) for h in range(n_heads)]
        mres = m_res_r[:].reshape(N, D).astype(jnp.float32)
        mf1 = m_ffn1_r[:].reshape(N, FF).astype(jnp.float32)
        mf2 = m_ffn2_r[:].reshape(N, D).astype(jnp.float32)
    elif has_seed:
        # identical draw order/seeding as the forward kernel → same masks
        masks_attn, mres, mf1, mf2 = _draw_keep_masks(
            seed_ref, dropout_p, n_heads, bt, L, D, FF
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwq_r, dbq_r, dwk_r, dbk_r, dwv_r, dbv_r, dwo_r, dbo_r,
                  dln1s_r, dln1b_r, dw1_r, db1_r, dw2_r, db2_r,
                  dln2s_r, dln2b_r):
            r[:] = jnp.zeros_like(r)

    x = x_ref[:].reshape(N, D)
    g_out = g_ref[:].reshape(N, D).astype(jnp.float32)

    def mm(a, b):  # (N,·)@(·,·) in compute dtype, fp32 accum
        return jnp.dot(a.astype(dt), b.astype(dt),
                       preferred_element_type=jnp.float32)

    # ——— forward recompute ———
    q = (mm(x, wq[:]) + bq[:]).astype(dt)
    k = (mm(x, wk[:]) + bk[:]).astype(dt)
    v = (mm(x, wv[:]) + bv[:]).astype(dt)

    scale = np.float32(1.0 / np.sqrt(hd))
    probs_list, probsm_list, oh_list = [], [], []
    for h in range(n_heads):
        qh = q[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        kh = k[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        vh = v[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1)           # fp32 (bt,L,L)
        pm = p * masks_attn[h] if use_drop else p
        oh = jax.lax.dot_general(pm.astype(dt), vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        probs_list.append(p)
        probsm_list.append(pm)
        oh_list.append(oh.astype(dt).reshape(N, hd))
    concat_o = jnp.concatenate(oh_list, axis=1)          # (N, inner) dt
    attn = (mm(concat_o, wo[:]) + bo[:]).astype(jnp.float32)
    if use_drop:
        attn = attn * mres
    r1 = x.astype(jnp.float32) + attn

    eps = np.float32(1e-6)

    def ln_fwd(h32, s_p, b_p):
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mu), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xhat = (h32 - mu) * inv
        return xhat * s_p[:] + b_p[:], xhat, inv

    h1, xhat1, inv1 = ln_fwd(r1, ln1_s, ln1_b)
    h1dt = h1.astype(dt)
    u = mm(h1dt, w1[:]) + b1[:]                          # fp32 (N, FF)
    g1, dgelu = _gelu_tanh_and_grad(u)
    g1m = g1 * mf1 if use_drop else g1
    z = mm(g1m.astype(dt), w2[:]) + b2[:]                # fp32 (N, D)
    if use_drop:
        z = z * mf2
    r2 = h1 + z
    _, xhat2, inv2 = ln_fwd(r2, ln2_s, ln2_b)

    # ——— backward ———
    def ln_bwd(gy, xhat, inv, s_p):
        ds = jnp.sum(gy * xhat, axis=0)
        db = jnp.sum(gy, axis=0)
        gxh = gy * s_p[:].astype(jnp.float32)
        gx = (gxh - jnp.mean(gxh, axis=-1, keepdims=True)
              - xhat * jnp.mean(gxh * xhat, axis=-1, keepdims=True)) * inv
        return gx, ds, db

    d_r2, ds2, db2_ln = ln_bwd(g_out, xhat2, inv2, ln2_s)
    dln2s_r[:] += ds2
    dln2b_r[:] += db2_ln

    d_h1 = d_r2
    d_z = d_r2 * mf2 if use_drop else d_r2
    dw2_r[:] += mm(g1m.astype(dt).T, d_z.astype(dt))
    db2_r[:] += jnp.sum(d_z, axis=0)
    d_g1m = mm(d_z.astype(dt), w2[:].T)
    d_g1 = d_g1m * mf1 if use_drop else d_g1m
    d_u = d_g1 * dgelu
    dw1_r[:] += mm(h1dt.T, d_u.astype(dt))
    db1_r[:] += jnp.sum(d_u, axis=0)
    d_h1 = d_h1 + mm(d_u.astype(dt), w1[:].T)

    d_r1, ds1, db1_ln = ln_bwd(d_h1, xhat1, inv1, ln1_s)
    dln1s_r[:] += ds1
    dln1b_r[:] += db1_ln

    dx = d_r1  # fp32 (N, D)
    d_attn = d_r1 * mres if use_drop else d_r1
    dwo_r[:] += mm(concat_o.T, d_attn.astype(dt))
    dbo_r[:] += jnp.sum(d_attn, axis=0)
    d_concat = mm(d_attn.astype(dt), wo[:].T)            # (N, inner) fp32

    d_q_parts, d_k_parts, d_v_parts = [], [], []
    for h in range(n_heads):
        d_oh = d_concat[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        vh = v[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        kh = k[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        qh = q[:, h * hd:(h + 1) * hd].reshape(bt, L, hd)
        pm = probsm_list[h]
        p = probs_list[h]
        # d_pm = d_oh @ vh^T ; d_v = pm^T @ d_oh
        d_pm = jax.lax.dot_general(d_oh.astype(dt), vh,
                                   (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        d_vh = jax.lax.dot_general(pm.astype(dt), d_oh.astype(dt),
                                   (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        d_p = d_pm * masks_attn[h] if use_drop else d_pm
        d_s = (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True)) * p * scale
        d_qh = jax.lax.dot_general(d_s.astype(dt), kh,
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        d_kh = jax.lax.dot_general(d_s.astype(dt), qh,
                                   (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        d_q_parts.append(d_qh.reshape(N, hd))
        d_k_parts.append(d_kh.reshape(N, hd))
        d_v_parts.append(d_vh.reshape(N, hd))
    d_q = jnp.concatenate(d_q_parts, axis=1)
    d_k = jnp.concatenate(d_k_parts, axis=1)
    d_v = jnp.concatenate(d_v_parts, axis=1)

    dwq_r[:] += mm(x.T, d_q.astype(dt))
    dbq_r[:] += jnp.sum(d_q, axis=0)
    dwk_r[:] += mm(x.T, d_k.astype(dt))
    dbk_r[:] += jnp.sum(d_k, axis=0)
    dwv_r[:] += mm(x.T, d_v.astype(dt))
    dbv_r[:] += jnp.sum(d_v, axis=0)

    dx = dx + mm(d_q.astype(dt), wq[:].T)
    dx = dx + mm(d_k.astype(dt), wk[:].T)
    dx = dx + mm(d_v.astype(dt), wv[:].T)
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(bt, L, D)


def _attention_pallas_bwd(x, params, masks, g, n_heads: int, interpret: bool,
                          dropout_p: float = 0.0, seed=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D = x.shape
    bt = _block_bt(x.dtype, training=True)
    n_blocks = -(-B // bt)
    pad = n_blocks * bt - B
    has_masks = masks is not None
    has_seed = dropout_p > 0.0 and seed is not None and not has_masks

    def pad0(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a

    x_p = pad0(x)
    g_p = pad0(g)
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
        for kname in ("m_attn", "m_res", "m_ffn1", "m_ffn2"):
            m = pad0(jnp.asarray(masks[kname], x.dtype))
            mask_args.append(m)
            mask_specs.append(batch_spec(m))
    elif has_seed:
        s, spec = _seed_arg_and_spec(seed, pl, pltpu)
        mask_args.append(s)
        mask_specs.append(spec)

    # param-grad outputs accumulate into block (0, …) every grid step (fp32)
    grad_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in flat]
    grad_specs = [w_spec(a) for a in flat]

    out = pl.pallas_call(
        partial(_bwd_kernel, n_heads=n_heads, bt=bt, has_masks=has_masks,
                dropout_p=dropout_p if has_seed else 0.0),
        grid=(n_blocks,),
        in_specs=[batch_spec(x_p)] + [w_spec(a) for a in flat] + mask_specs
        + [batch_spec(g_p)],
        out_specs=[batch_spec(x_p)] + grad_specs,
        out_shape=[jax.ShapeDtypeStruct(x_p.shape, x.dtype)] + grad_shapes,
        # param grads accumulate into revisited output blocks → the grid must
        # execute in order, not be parallelized/double-buffered
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_p, *flat, *mask_args, g_p)
    dx = out[0][:B]
    dparams = {
        k: gr.astype(params[k].dtype)
        for k, gr in zip(_PARAM_ORDER, out[1:])
    }
    return dx, dparams
