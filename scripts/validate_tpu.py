"""TPU-only validations that CPU interpret mode cannot cover: the in-kernel
PRNG dropout path. Strategy: extract the exact masks the kernels draw for a
given seed with a standalone Pallas kernel, then require the seed-mode
forward AND gradients to equal the explicit-mask mode (whose gradients are
validated against the XLA reference elsewhere) bit-for-bit.

(A finite-difference check is NOT usable here: the loss is a sum of ~10⁵
terms computed through bf16-pass matmuls, so FD differences drown in
accumulation noise long before the linear regime.)

Run: python scripts/validate_tpu.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.ops import attention as A
from eeg_image_decode_tpu.ops import projection as P

B, L, D, INNER, FF, H = 16, 64, 250, 248, 256, 4
P_DROP = 0.25


def extract_masks(seed, bt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mask_kernel(seed_ref, ma, mr, m1, m2):
        masks_attn, mres, mf1, mf2 = A._draw_keep_masks(
            seed_ref, P_DROP, H, bt, L, D, FF
        )
        for h in range(H):
            ma[:, h] = masks_attn[h]
        mr[:] = mres.reshape(bt, L, D)
        m1[:] = mf1.reshape(bt, L, FF)
        m2[:] = mf2.reshape(bt, L, D)

    n_blocks = B // bt
    outs = pl.pallas_call(
        mask_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((bt, H, L, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, FF), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            jax.ShapeDtypeStruct((B, L, FF), jnp.float32),
            jax.ShapeDtypeStruct((B, L, D), jnp.float32),
        ],
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return {"m_attn": outs[0], "m_res": outs[1],
            "m_ffn1": outs[2], "m_ffn2": outs[3]}


def main():
    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    assert jax.default_backend() == "tpu", "needs a TPU"
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    params = {
        "wq": r(D, INNER), "bq": r(INNER), "wk": r(D, INNER), "bk": r(INNER),
        "wv": r(D, INNER), "bv": r(INNER), "wo": r(INNER, D), "bo": r(D),
        "ln1_s": jnp.ones(D), "ln1_b": jnp.zeros(D),
        "w1": r(D, FF), "b1": r(FF), "w2": r(FF, D), "b2": r(D),
        "ln2_s": jnp.ones(D), "ln2_b": jnp.zeros(D),
    }
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    seed = jnp.asarray(1234, jnp.int32)

    f = jax.jit(lambda x, s: A.fused_attention_layer(
        x, params, None, H, False, P_DROP, s))
    a, b = f(x, seed), f(x, seed)
    c = f(x, jnp.asarray(999, jnp.int32))
    clean = jax.jit(lambda x: A.fused_attention_layer(x, params, None, H))(x)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "same seed differs!"
    assert not np.allclose(np.asarray(a), np.asarray(c)), "seed inert!"
    assert not np.allclose(np.asarray(a), np.asarray(clean)), "dropout inert!"
    print("determinism + seed sensitivity: ok")

    masks = extract_masks(seed, bt=4)  # fp32 tile
    keep_fracs = [float((np.asarray(m) > 0).mean()) for m in masks.values()]
    assert all(abs(kf - (1 - P_DROP)) < 0.01 for kf in keep_fracs), keep_fracs
    print("mask keep fractions:", [round(k, 3) for k in keep_fracs])

    f_mask = jax.jit(lambda x: A.fused_attention_layer(x, params, masks, H))
    np.testing.assert_array_equal(np.asarray(f(x, seed)),
                                  np.asarray(f_mask(x)))
    print("seed-mode forward == explicit-mask forward (bit-exact)")

    w = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    g_seed = jax.jit(jax.grad(lambda x: jnp.sum(
        A.fused_attention_layer(x, params, None, H, False, P_DROP, seed) * w
    )))(x)
    g_mask = jax.jit(jax.grad(lambda x: jnp.sum(
        A.fused_attention_layer(x, params, masks, H) * w)))(x)
    np.testing.assert_array_equal(np.asarray(g_seed), np.asarray(g_mask))
    print("seed-mode gradients == explicit-mask gradients (bit-exact)")

    validate_projection(rng)


def extract_projection_mask(seed, n_rows, bt, d_out, p_drop):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mask_kernel(seed_ref, m_ref):
        m_ref[:] = P._draw_keep_mask(seed_ref, p_drop, (bt, d_out))

    n_blocks = n_rows // bt
    return pl.pallas_call(
        mask_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((bt, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, d_out), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))


def validate_projection(rng):
    """Same strong check for the fused projection head (ops/projection.py):
    seed-mode fwd and grads must equal the explicit-mask mode bit-for-bit
    on the masks the kernel actually draws."""
    d_in, d_out, n = 1440, 1024, 512
    p_drop = 0.5
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
    params = {
        "wi": r(d_in, d_out), "bi": r(d_out),
        "wr": r(d_out, d_out), "br": r(d_out),
        "ln_s": jnp.ones(d_out), "ln_b": jnp.zeros(d_out),
    }
    x = jnp.asarray(rng.normal(size=(n, d_in)).astype(np.float32))
    seed = jnp.asarray(4321, jnp.int32)
    bt = min(P.BLOCK_BT, n)

    f = jax.jit(lambda x, s: P.fused_projection_head(
        x, params, None, p_drop, False, s))
    a, b = f(x, seed), f(x, seed)
    c = f(x, jnp.asarray(77, jnp.int32))
    assert np.array_equal(np.asarray(a), np.asarray(b)), "same seed differs!"
    assert not np.allclose(np.asarray(a), np.asarray(c)), "seed inert!"

    mask = extract_projection_mask(seed, n, bt, d_out, p_drop)
    kf = float((np.asarray(mask) > 0).mean())
    assert abs(kf - (1 - p_drop)) < 0.01, kf
    f_mask = jax.jit(lambda x: P.fused_projection_head(x, params, mask))
    np.testing.assert_array_equal(np.asarray(f(x, seed)),
                                  np.asarray(f_mask(x)))
    w = jnp.asarray(rng.normal(size=(n, d_out)).astype(np.float32))
    g_seed = jax.jit(jax.grad(lambda x: jnp.sum(
        P.fused_projection_head(x, params, None, p_drop, False, seed) * w
    )))(x)
    g_mask = jax.jit(jax.grad(lambda x: jnp.sum(
        P.fused_projection_head(x, params, mask) * w)))(x)
    np.testing.assert_array_equal(np.asarray(g_seed), np.asarray(g_mask))
    print("projection head: seed-mode fwd+grads == explicit-mask (bit-exact)")


if __name__ == "__main__":
    main()
