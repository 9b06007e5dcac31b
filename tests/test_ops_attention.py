"""Fused attention-layer kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.ops.attention import (
    attention_layer_reference,
    fused_attention_layer,
)

B, L, D, INNER, FF, H = 5, 16, 48, 32, 64, 4


def _params(rng):
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    return {
        "wq": r(D, INNER), "bq": r(INNER),
        "wk": r(D, INNER), "bk": r(INNER),
        "wv": r(D, INNER), "bv": r(INNER),
        "wo": r(INNER, D), "bo": r(D),
        "ln1_s": jnp.ones(D), "ln1_b": jnp.zeros(D),
        "w1": r(D, FF), "b1": r(FF),
        "w2": r(FF, D), "b2": r(D),
        "ln2_s": jnp.ones(D), "ln2_b": jnp.zeros(D),
    }


def test_fused_matches_reference(rng):
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    want = attention_layer_reference(x, params, n_heads=H)
    got = fused_attention_layer(x, params, None, H, True)
    assert got.shape == (B, L, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_gradients_match_reference(rng):
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(2, L, D)).astype(np.float32))

    def loss_f(x, p):
        return jnp.sum(fused_attention_layer(x, p, None, H, True) ** 2)

    def loss_r(x, p):
        return jnp.sum(attention_layer_reference(x, p, n_heads=H) ** 2)

    gx_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-3)
    for k in gp_f:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_r[k]),
                                   atol=1e-3, rtol=1e-3, err_msg=k)


def test_fused_nonaligned_batch(rng):
    """B=5 is not a multiple of the 8-row batch tile — padding path."""
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(5, L, D)).astype(np.float32))
    got = fused_attention_layer(x, params, None, H, True)
    want = attention_layer_reference(x, params, n_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_bf16(rng):
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), _params(rng)
    )
    x = jnp.asarray(rng.normal(size=(4, L, D)), jnp.bfloat16)
    got = fused_attention_layer(x, params, None, H, True)
    want = attention_layer_reference(x, params, n_heads=H)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_with_dropout_masks_matches_reference(rng):
    """Train-mode path: pre-scaled keep-masks applied inside the kernel must
    match the reference applying the same masks, and grads must agree."""
    from eeg_image_decode_tpu.ops.attention import (
        attention_layer_reference as ref,
    )

    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(3, L, D)).astype(np.float32))
    keep = 0.75
    kr = np.random.default_rng(7)
    masks = {
        "m_attn": jnp.asarray(
            (kr.random((3, H, L, L)) < keep).astype(np.float32) / keep),
        "m_res": jnp.asarray(
            (kr.random((3, L, D)) < keep).astype(np.float32) / keep),
        "m_ffn1": jnp.asarray(
            (kr.random((3, L, FF)) < keep).astype(np.float32) / keep),
        "m_ffn2": jnp.asarray(
            (kr.random((3, L, D)) < keep).astype(np.float32) / keep),
    }
    got = fused_attention_layer(x, params, masks, H, True)
    want = ref(x, params, masks, n_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # masks actually do something
    base = fused_attention_layer(x, params, None, H, True)
    assert not np.allclose(np.asarray(got), np.asarray(base))

    g_f = jax.grad(lambda x: jnp.sum(
        fused_attention_layer(x, params, masks, H, True) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(ref(x, params, masks, n_heads=H) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-3, rtol=1e-3)


def test_in_kernel_prng_dropout_deterministic_and_grad_consistent(rng):
    """Seed-mode dropout (TPU-only: the hardware PRNG has no CPU-interpret
    implementation). Determinism + seed sensitivity here; the strong check —
    bit-exact fwd/grad equality against extracted explicit masks — lives in
    scripts/validate_tpu.py (run on the real chip)."""
    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("in-kernel PRNG requires a real TPU")
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(2, L, D)).astype(np.float32))
    seed = jnp.asarray(1234, jnp.int32)
    f = lambda x, s: fused_attention_layer(x, params, None, H, False, 0.25, s)
    a, b = f(x, seed), f(x, seed)
    c = f(x, jnp.asarray(999, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
