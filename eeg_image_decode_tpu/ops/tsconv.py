"""Fused temporal-conv + average-pool (the tsconv hot path).

The ShallowNet-style stage every encoder shares (ref
``Retrieval/ATMS_retrieval.py:101-104``) is

    Conv2d(1→40, kernel (1,25)) → AvgPool((1,51), stride (1,5))

Both ops are linear in the input, so the pool **folds into the conv**: the
pooled output at stride-5 position p is

    y[p, f] = (1/51) Σ_{u=0..50} Σ_{k=0..24} x[5p+u+k] w[k, f]
            = Σ_{m=0..74} x[5p+m] w̃[m, f],   w̃ = box₅₁ * w  (correlation)

i.e. ONE conv with a precomputed 75-tap kernel at stride 5 — 46% fewer FLOPs
than conv-then-pool and no intermediate (B, 40, 63, 226) tensor in HBM
(≈ 2.3 GB at batch 1024 that the reference materializes).

Three implementations of the folded conv, all parity-tested:

- ``tsconv_pool_matmul`` (DEFAULT): expand w̃ into a dense (T, P·F) operand
  and run the whole stage as ONE (B·C, T)×(T, P·F) MXU matmul
  (:func:`expand_folded_kernel`). ~3.3× the minimal FLOPs (the operand is
  ~30% dense) but by far the fastest fwd+bwd on TPU: autodiff's backward is
  two equally dense matmuls with no layout copies. Switching the flagship
  train step to this formulation measured 48.6k → 89.1k samples/s on v5e
  (the XLA conv-vjp backward it replaced forced fp32 casts + layout copies
  of the (B·C, P·F) cotangent — profiled at ~45% of the step).
- ``tsconv_pool_fused``: explicit Pallas kernel (36 per-position MXU matmuls
  in VMEM) with a native Pallas backward (fp32 VMEM accumulation, dw
  accumulated across the sequential grid). Kept for reference and as the
  minimal-FLOPs variant; loses to the dense matmul at flagship shapes.
- ``tsconv_pool_reference``: XLA strided conv (the numerics oracle and
  non-TPU fallback).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def fold_pool_into_kernel(
    w: jax.Array, pool_size: int = 51, normalize: bool = True
) -> jax.Array:
    """(K, F) conv taps → (K+pool−1, F) pooled-conv taps (box correlation)."""
    k, f = w.shape
    out_len = k + pool_size - 1
    idx = jnp.arange(out_len)[:, None] - jnp.arange(pool_size)[None, :]  # (M, P)
    valid = (idx >= 0) & (idx < k)
    gathered = jnp.where(
        valid[..., None], w[jnp.clip(idx, 0, k - 1)], 0.0
    )  # (M, P, F)
    w_tilde = gathered.sum(axis=1)
    return w_tilde / pool_size if normalize else w_tilde


def _out_positions(t: int, k_fused: int, stride: int) -> int:
    return (t - k_fused) // stride + 1


def tsconv_pool_reference(
    x: jax.Array, w_tilde: jax.Array, stride: int = 5
) -> jax.Array:
    """XLA reference: (B, C, T) × (M, F) → (B, C, P, F). Used for the
    backward pass and as the non-TPU fallback."""
    b, c, t = x.shape
    m, f = w_tilde.shape
    p = _out_positions(t, m, stride)
    out = jax.lax.conv_general_dilated(
        x.reshape(b * c, t, 1),
        w_tilde[:, None, :],  # (M, 1, F)
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, c, p, f).astype(x.dtype)


def _tsconv_kernel(x_ref, w_ref, o_ref, *, stride: int, n_pos: int):
    """Pallas body: rows-block of x (R, T) → (R, P·F) via P matmuls."""
    import jax.experimental.pallas as pl  # noqa: F401  (doc anchor)

    x = x_ref[:]  # (R, T)
    w = w_ref[:]  # (M, F)
    m = w.shape[0]
    outs = []
    for p in range(n_pos):
        window = jax.lax.slice_in_dim(x, p * stride, p * stride + m, axis=1)
        outs.append(
            jnp.dot(window, w, preferred_element_type=jnp.float32)
        )  # (R, F)
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _tsconv_pallas(x2: jax.Array, w_tilde: jax.Array, stride: int,
                   n_pos: int, interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, t = x2.shape
    m, f = w_tilde.shape
    block_rows = 256
    n_blocks = -(-rows // block_rows)
    pad_rows = n_blocks * block_rows - rows
    if pad_rows:
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))

    out = pl.pallas_call(
        partial(_tsconv_kernel, stride=stride, n_pos=n_pos),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, n_pos * f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, n_pos * f),
                                       x2.dtype),
        interpret=interpret,
    )(x2, w_tilde.astype(x2.dtype))
    return out[:rows]


def _tsconv_bwd_kernel(x_ref, g_ref, w_ref, dx_ref, dw_ref, *,
                       stride: int, n_pos: int):
    """Native backward, one row-block per grid step.

    dx[r, p·s+m] += Σ_f g[r, p·F+f] w̃[m, f]   (R,F)@(F,M) per position
    dw̃[m, f]    += Σ_r x[r, p·s+m] g[r, p·F+f] (M,R)@(R,F), accumulated in
    fp32 across positions AND grid steps — the TPU grid is sequential, so
    ``dw_ref`` doubles as the cross-block accumulator (same pattern as the
    attention backward's param grads, ops/attention.py)."""
    import jax.experimental.pallas as pl

    x = x_ref[:]  # (R, T)
    g = g_ref[:]  # (R, P·F)
    w = w_ref[:]  # (M, F)
    m, f = w.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dx_ref[:] = jnp.zeros_like(dx_ref)
    for p in range(n_pos):
        g_p = jax.lax.slice_in_dim(g, p * f, (p + 1) * f, axis=1)  # (R, F)
        lo = p * stride
        dx_ref[:, lo : lo + m] += jnp.dot(
            g_p, w.T, preferred_element_type=jnp.float32
        ).astype(dx_ref.dtype)
        window = jax.lax.slice_in_dim(x, lo, lo + m, axis=1)  # (R, M)
        dw_ref[:] += jnp.dot(
            window.T, g_p, preferred_element_type=jnp.float32
        )


def _tsconv_bwd_pallas(x2, g2, w_tilde, stride, n_pos, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, t = x2.shape
    m, f = w_tilde.shape
    block_rows = 256
    n_blocks = -(-rows // block_rows)
    pad_rows = n_blocks * block_rows - rows
    if pad_rows:  # zero rows contribute nothing to dw; dx pad sliced off
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad_rows), (0, 0)))

    dx, dw = pl.pallas_call(
        partial(_tsconv_bwd_kernel, stride=stride, n_pos=n_pos),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, n_pos * f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * block_rows, t), jnp.float32),
            jax.ShapeDtypeStruct((m, f), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g2, w_tilde.astype(x2.dtype))
    return dx[:rows], dw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tsconv_pool_fused(
    x: jax.Array, w_tilde: jax.Array, stride: int = 5, interpret: bool = False
) -> jax.Array:
    """Fused conv+pool: (B, C, T) × (M, F) → (B, C, P, F) on the MXU."""
    b, c, t = x.shape
    m, f = w_tilde.shape
    n_pos = _out_positions(t, m, stride)
    out = _tsconv_pallas(x.reshape(b * c, t), w_tilde, stride, n_pos, interpret)
    return out.reshape(b, c, n_pos, f)


def _fwd(x, w_tilde, stride, interpret):
    return tsconv_pool_fused(x, w_tilde, stride, interpret), (x, w_tilde)


def _bwd(stride, interpret, res, g):
    # Native Pallas backward: the previous XLA conv-vjp fallback forced fp32
    # casts + layout copies of the (B·C, P·F) cotangent that cost ~40% of the
    # flagship train step (profiled on v5e); the kernel keeps everything
    # bf16-in / fp32-accumulate inside VMEM.
    x, w_tilde = res
    b, c, t = x.shape
    m, f = w_tilde.shape
    n_pos = _out_positions(t, m, stride)
    dx2, dw = _tsconv_bwd_pallas(
        x.reshape(b * c, t),
        g.reshape(b * c, n_pos * f).astype(x.dtype),
        w_tilde, stride, n_pos, interpret,
    )
    return (
        dx2.reshape(b, c, t).astype(x.dtype),
        dw.astype(w_tilde.dtype),
    )


tsconv_pool_fused.defvjp(_fwd, _bwd)


def expand_folded_kernel(
    w_tilde: jax.Array, t: int, stride: int
) -> jax.Array:
    """(M, F) folded taps → dense (T, P·F) matmul operand.

    ``E[t, p·F + f] = w̃[t − p·stride, f]`` (zero outside the tap range), so
    the whole strided conv+pool becomes ``x2 @ E`` — ONE (B·C, T)×(T, P·F)
    MXU matmul. E is ~30% dense, i.e. ~3.3× the minimal FLOPs, but on TPU a
    single large dense matmul beats 36 small per-position ones *and* its
    autodiff backward is two equally dense matmuls (dx = g@Eᵀ, dE = x2ᵀ@g)
    with no layout copies — measured fastest fwd+bwd of the three
    formulations on v5e at the flagship batch."""
    m, f = w_tilde.shape
    n_pos = _out_positions(t, m, stride)
    mm = jnp.arange(t)[:, None] - jnp.arange(n_pos)[None, :] * stride  # (T,P)
    valid = (mm >= 0) & (mm < m)
    gathered = jnp.where(
        valid[..., None], w_tilde[jnp.clip(mm, 0, m - 1)], 0.0
    )  # (T, P, F)
    return gathered.reshape(t, n_pos * f)


def tsconv_pool_matmul(
    x: jax.Array, w_tilde: jax.Array, stride: int = 5
) -> jax.Array:
    """Dense-matmul formulation: (B, C, T) × (M, F) → (B, C, P, F)."""
    b, c, t = x.shape
    m, f = w_tilde.shape
    n_pos = _out_positions(t, m, stride)
    e = expand_folded_kernel(w_tilde, t, stride).astype(x.dtype)
    out = jnp.dot(
        x.reshape(b * c, t), e, preferred_element_type=jnp.float32
    )
    return out.reshape(b, c, n_pos, f).astype(x.dtype)


def tsconv_stage1(
    x: jax.Array,
    w: jax.Array,
    *,
    pool_size: int = 51,
    stride: int = 5,
    use_pallas: bool = True,
    interpret: bool | None = None,
    impl: str = "matmul",
) -> jax.Array:
    """User-facing fused stage-1: raw 25-tap kernel in, pooled features out.

    ``impl``: 'matmul' (default — fastest on TPU and works everywhere),
    'pallas' (the explicit VMEM kernel; ``interpret=None`` → compiled on
    TPU, interpreter elsewhere), or 'conv' (XLA conv reference).
    ``use_pallas=False`` forces 'conv' (back-compat)."""
    w_tilde = fold_pool_into_kernel(w, pool_size)
    if not use_pallas:
        impl = "conv"
    if impl == "matmul":
        return tsconv_pool_matmul(x, w_tilde, stride)
    if impl == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return tsconv_pool_fused(x, w_tilde, stride, interpret)
    return tsconv_pool_reference(x, w_tilde, stride)
