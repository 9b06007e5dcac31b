"""Fused projection-head Pallas kernel (the ``Proj_eeg`` MLP).

Fuses the whole projection head of ATM-S/NICE (ref
``Retrieval/ATMS_retrieval.py:157-167``):

    y = LayerNorm(in_proj(x) + Dropout(res_proj(GELU(in_proj(x)))))

into one VMEM-resident kernel per batch tile, plus a native backward that
recomputes the forward in VMEM and accumulates fp32 parameter grads across
sequential grid steps — the same design as ``ops/attention.py`` (whose
measured win motivated this: the head's three matmuls are ~150 µs of MXU
work, but the XLA chain around them — exact-erf GELU in fp32, dropout mask
traffic, fp32 LayerNorm passes, residual — profiled at ~12% of the training
step, scripts/profile_step.py).

Dropout matches the reference site (AFTER res_proj, before the residual
add). Masks are either passed in (tests / CPU) or drawn in-kernel by the
TPU hardware PRNG from a scalar seed with per-draw salting, so forward and
backward reproduce identical masks with zero mask HBM traffic.

GELU note: the reference head uses exact (erf) GELU; Mosaic lowers neither
erf nor erfc, so the fused path uses the tanh approximation (|Δ| ≲ 1e-3 —
the same documented tradeoff as the attention FFN). The XLA path in
``models/layers.py::ProjectionHead`` keeps exact GELU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# batch-tile rows per grid step; candidates swept on chip with
# scripts/bench_projection.py
BLOCK_BT = 256

_PARAM_ORDER = ("wi", "bi", "wr", "br", "ln_s", "ln_b")


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


def projection_head_reference(x, params, mask=None):
    """jnp reference of the fused head (tanh GELU, fp32 LN — the exact math
    the kernel implements). ``mask``: optional pre-scaled keep-mask
    (B, d_out) applied after res_proj (the reference's dropout site)."""
    dt = x.dtype

    def dense(h, w, b):
        return (
            jnp.dot(h, w.astype(dt), preferred_element_type=jnp.float32)
            + b.astype(jnp.float32)
        )

    a = dense(x, params["wi"], params["bi"])              # fp32 (B, d_out)
    g, _ = _gelu_tanh_and_grad(a)
    z = dense(g.astype(dt), params["wr"], params["br"])   # fp32
    if mask is not None:
        z = z * mask.astype(jnp.float32)
    r = a + z
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mu), axis=-1, keepdims=True)
    xhat = (r - mu) * jax.lax.rsqrt(var + np.float32(1e-6))
    return xhat * params["ln_s"].astype(jnp.float32) + params["ln_b"].astype(
        jnp.float32
    )


def _draw_keep_mask(seed_ref, dropout_p, shape):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    keep = 1.0 - dropout_p
    thresh = np.uint32(int(keep * 0xFFFFFFFF))
    inv_keep = np.float32(1.0 / keep)
    # pure function of (seed, grid position): fwd and bwd draw identically
    pltpu.prng_seed(seed_ref[0, 0] * 277 + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return jnp.where(bits < thresh, inv_keep, np.float32(0.0))


def _fwd_kernel(x_ref, wi, bi, wr, br, ln_s, ln_b, *rest,
                has_mask: bool, dropout_p: float):
    has_seed = dropout_p > 0.0 and not has_mask
    if has_mask:
        m_ref, o_ref = rest
    elif has_seed:
        seed_ref, o_ref = rest
    else:
        (o_ref,) = rest
    dt = x_ref.dtype

    x = x_ref[:]
    a = (
        jnp.dot(x, wi[:], preferred_element_type=jnp.float32)
        + bi[:].astype(jnp.float32)
    )
    g, _ = _gelu_tanh_and_grad(a)
    z = (
        jnp.dot(g.astype(dt), wr[:], preferred_element_type=jnp.float32)
        + br[:].astype(jnp.float32)
    )
    if has_mask:
        z = z * m_ref[:].astype(jnp.float32)
    elif has_seed:
        z = z * _draw_keep_mask(seed_ref, dropout_p, z.shape)
    r = a + z
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mu), axis=-1, keepdims=True)
    xhat = (r - mu) * jax.lax.rsqrt(var + np.float32(1e-6))
    o_ref[:] = xhat * ln_s[:].astype(jnp.float32) + ln_b[:].astype(
        jnp.float32
    )


def _bwd_kernel(x_ref, wi, bi, wr, br, ln_s, ln_b, *rest,
                has_mask: bool, dropout_p: float):
    import jax.experimental.pallas as pl

    has_seed = dropout_p > 0.0 and not has_mask
    if has_mask:
        (m_ref, g_ref, dx_ref,
         dwi_r, dbi_r, dwr_r, dbr_r, dlns_r, dlnb_r) = rest
    elif has_seed:
        (seed_ref, g_ref, dx_ref,
         dwi_r, dbi_r, dwr_r, dbr_r, dlns_r, dlnb_r) = rest
    else:
        (g_ref, dx_ref,
         dwi_r, dbi_r, dwr_r, dbr_r, dlns_r, dlnb_r) = rest
    dt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwi_r, dbi_r, dwr_r, dbr_r, dlns_r, dlnb_r):
            r[:] = jnp.zeros_like(r)

    # ——— forward recompute ———
    x = x_ref[:]
    a = (
        jnp.dot(x, wi[:], preferred_element_type=jnp.float32)
        + bi[:].astype(jnp.float32)
    )
    g, dgelu = _gelu_tanh_and_grad(a)
    gdt = g.astype(dt)
    z = (
        jnp.dot(gdt, wr[:], preferred_element_type=jnp.float32)
        + br[:].astype(jnp.float32)
    )
    if has_mask:
        mask = m_ref[:].astype(jnp.float32)
    elif has_seed:
        mask = _draw_keep_mask(seed_ref, dropout_p, z.shape)
    if has_mask or has_seed:
        z = z * mask
    r = a + z
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + np.float32(1e-6))
    xhat = (r - mu) * inv

    # ——— backward ———
    g_out = g_ref[:].astype(jnp.float32)
    dlns_r[:] += jnp.sum(g_out * xhat, axis=0)
    dlnb_r[:] += jnp.sum(g_out, axis=0)
    gxh = g_out * ln_s[:].astype(jnp.float32)
    d_r = (gxh - jnp.mean(gxh, axis=-1, keepdims=True)
           - xhat * jnp.mean(gxh * xhat, axis=-1, keepdims=True)) * inv
    d_z = d_r * mask if (has_mask or has_seed) else d_r
    d_zdt = d_z.astype(dt)
    dwr_r[:] += jnp.dot(gdt.T, d_zdt, preferred_element_type=jnp.float32)
    dbr_r[:] += jnp.sum(d_z, axis=0)
    d_g = jnp.dot(d_zdt, wr[:].T, preferred_element_type=jnp.float32)
    d_a = d_r + d_g * dgelu
    d_adt = d_a.astype(dt)
    dwi_r[:] += jnp.dot(x.T, d_adt, preferred_element_type=jnp.float32)
    dbi_r[:] += jnp.sum(d_a, axis=0)
    dx_ref[:] = jnp.dot(
        d_adt, wi[:].T, preferred_element_type=jnp.float32
    ).astype(dx_ref.dtype)


def _specs(pl, pltpu, bt, arrs):
    def w_spec(arr):
        shape = arr.shape
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def batch_spec(arr):
        shape = (bt,) + arr.shape[1:]
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    return w_spec, batch_spec


def _run_fwd(x, params, mask, dropout_p, seed, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, d_in = x.shape
    d_out = params["wi"].shape[1]
    bt = min(BLOCK_BT, max(8, B))
    n_blocks = -(-B // bt)
    pad = n_blocks * bt - B
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    flat = [jnp.asarray(params[k], x.dtype) for k in _PARAM_ORDER]
    w_spec, batch_spec = _specs(pl, pltpu, bt, flat)

    has_mask = mask is not None
    has_seed = dropout_p > 0.0 and seed is not None and not has_mask
    extra_args, extra_specs = [], []
    if has_mask:
        m = jnp.asarray(mask, x.dtype)
        if pad:
            m = jnp.pad(m, ((0, pad), (0, 0)))
        extra_args.append(m)
        extra_specs.append(batch_spec(m))
    elif has_seed:
        s = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        extra_args.append(s)
        extra_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )

    out = pl.pallas_call(
        partial(_fwd_kernel, has_mask=has_mask,
                dropout_p=dropout_p if has_seed else 0.0),
        grid=(n_blocks,),
        in_specs=[batch_spec(x)] + [w_spec(a) for a in flat] + extra_specs,
        out_specs=batch_spec(jnp.zeros((1, d_out))),
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *flat, *extra_args)
    return out[:B]


def _run_bwd(x, params, mask, g, dropout_p, seed, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, d_in = x.shape
    d_out = params["wi"].shape[1]
    bt = min(BLOCK_BT, max(8, B))
    n_blocks = -(-B // bt)
    pad = n_blocks * bt - B
    x_p = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    g_p = jnp.pad(g, ((0, pad), (0, 0))) if pad else g
    flat = [jnp.asarray(params[k], x.dtype) for k in _PARAM_ORDER]
    w_spec, batch_spec = _specs(pl, pltpu, bt, flat)

    has_mask = mask is not None
    has_seed = dropout_p > 0.0 and seed is not None and not has_mask
    extra_args, extra_specs = [], []
    if has_mask:
        m = jnp.asarray(mask, x.dtype)
        if pad:
            m = jnp.pad(m, ((0, pad), (0, 0)))
        extra_args.append(m)
        extra_specs.append(batch_spec(m))
    elif has_seed:
        s = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        extra_args.append(s)
        extra_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )

    grad_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in flat]
    out = pl.pallas_call(
        partial(_bwd_kernel, has_mask=has_mask,
                dropout_p=dropout_p if has_seed else 0.0),
        grid=(n_blocks,),
        in_specs=[batch_spec(x_p)] + [w_spec(a) for a in flat]
        + extra_specs + [batch_spec(g_p)],
        out_specs=[batch_spec(x_p)] + [w_spec(a) for a in flat],
        out_shape=[jax.ShapeDtypeStruct(x_p.shape, x.dtype)] + grad_shapes,
        # param grads accumulate into revisited output blocks → sequential grid
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_p, *flat, *extra_args, g_p)
    dx = out[0][:B]
    dparams = {
        k: gr.astype(params[k].dtype) for k, gr in zip(_PARAM_ORDER, out[1:])
    }
    return dx, dparams


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_projection_head(x, params, mask=None, dropout_p: float = 0.0,
                          interpret: bool = False, seed=None):
    """Fused projection head: (B, d_in) → (B, d_out) fp32.

    ``params``: dict wi (d_in,d_out), bi, wr (d_out,d_out), br, ln_s, ln_b.
    Dropout two ways, like ``fused_attention_layer``: an explicit pre-scaled
    keep ``mask`` (tests), or ``dropout_p`` + scalar int32 ``seed`` (a traced
    array is fine) drawn by the in-kernel TPU PRNG (training)."""
    return _run_fwd(x, params, mask, dropout_p, seed, interpret)


def _fwd_rule(x, params, mask, dropout_p, interpret, seed):
    return (
        fused_projection_head(x, params, mask, dropout_p, interpret, seed),
        (x, params, mask, seed),
    )


def _bwd_rule(dropout_p, interpret, res, g):
    x, params, mask, seed = res
    dx, dparams = _run_bwd(x, params, mask, g, dropout_p, seed, interpret)
    g_mask = None if mask is None else jnp.zeros_like(mask)
    return dx, dparams, g_mask, None


fused_projection_head.defvjp(_fwd_rule, _bwd_rule)
