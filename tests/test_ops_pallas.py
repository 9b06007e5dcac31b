"""Pallas kernel tests (interpret mode on CPU): fused tsconv+pool must match
the unfused conv→pool reference bit-for-bit-ish, and gradients must flow."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.ops.tsconv import (
    fold_pool_into_kernel,
    tsconv_pool_fused,
    tsconv_pool_reference,
    tsconv_stage1,
)


def _unfused(x, w, pool=51, stride=5):
    """conv(1,25) then avg-pool(51, stride 5) — the reference computation."""
    b, c, t = x.shape
    k, f = w.shape
    conv = jax.lax.conv_general_dilated(
        x.reshape(b * c, t, 1), w[:, None, :], (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (b*c, t-k+1, f)
    n_pos = (conv.shape[1] - pool) // stride + 1
    pooled = jnp.stack(
        [conv[:, p * stride : p * stride + pool].mean(axis=1) for p in range(n_pos)],
        axis=1,
    )
    return pooled.reshape(b, c, n_pos, f)


def test_fold_pool_identity():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(25, 4)), jnp.float32)
    wt = fold_pool_into_kernel(w, pool_size=51)
    assert wt.shape == (75, 4)
    # every original tap contributes to exactly 51 fused taps with weight 1/51
    np.testing.assert_allclose(
        np.asarray(wt).sum(0), np.asarray(w).sum(0), rtol=1e-5
    )


def test_fused_matches_unfused(rng):
    x = jnp.asarray(rng.normal(size=(3, 7, 250)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(25, 8)).astype(np.float32))
    want = _unfused(x, w)
    got_ref = tsconv_stage1(x, w, use_pallas=False)
    got_pal = tsconv_stage1(x, w, use_pallas=True, interpret=True)
    assert want.shape == got_ref.shape == got_pal.shape == (3, 7, 36, 8)
    np.testing.assert_allclose(np.asarray(got_ref), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pal), np.asarray(want), atol=2e-5)


def test_fused_gradients_match_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 250)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(75, 8)).astype(np.float32))

    def loss_pal(x, w):
        return jnp.sum(tsconv_pool_fused(x, w, 5, True) ** 2)

    def loss_ref(x, w):
        return jnp.sum(tsconv_pool_reference(x, w, 5) ** 2)

    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(x, wt)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-4)


def test_fused_handles_nonaligned_rows(rng):
    """rows = B·C = 5·9 = 45, far from the 256-row block — padding path."""
    x = jnp.asarray(rng.normal(size=(5, 9, 130)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(25, 8)).astype(np.float32))
    got = tsconv_stage1(x, w, use_pallas=True, interpret=True)
    want = tsconv_stage1(x, w, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matmul_impl_matches_conv(rng):
    """The dense-matmul formulation (the TPU default) vs the conv oracle,
    values and gradients, including non-aligned shapes."""
    from eeg_image_decode_tpu.ops.tsconv import (
        expand_folded_kernel,
        tsconv_pool_matmul,
    )

    x = jnp.asarray(rng.normal(size=(3, 7, 130)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(75, 8)).astype(np.float32))
    got = tsconv_pool_matmul(x, wt, 5)
    want = tsconv_pool_reference(x, wt, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)

    gm = jax.grad(lambda x, w: jnp.sum(tsconv_pool_matmul(x, w, 5) ** 2),
                  argnums=(0, 1))(x, wt)
    gr = jax.grad(lambda x, w: jnp.sum(tsconv_pool_reference(x, w, 5) ** 2),
                  argnums=(0, 1))(x, wt)
    for a, b in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)

    # the expanded operand realizes E[t, p·F+f] = w̃[t − p·s, f]
    e = np.asarray(expand_folded_kernel(wt, 130, 5)).reshape(130, -1, 8)
    assert e.shape[1] == (130 - 75) // 5 + 1
    np.testing.assert_array_equal(e[9, 1], np.asarray(wt)[4])  # t=9,p=1,m=4
    np.testing.assert_array_equal(e[3, 1], np.zeros(8))        # t−s < 0


def test_stage1_impl_selection(rng):
    """tsconv_stage1 impl flag: matmul/pallas/conv all agree; use_pallas=False
    forces the conv path."""
    x = jnp.asarray(rng.normal(size=(2, 4, 130)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(25, 8)).astype(np.float32))
    outs = {
        impl: tsconv_stage1(x, w, impl=impl, interpret=True)
        for impl in ("matmul", "pallas", "conv")
    }
    np.testing.assert_allclose(np.asarray(outs["matmul"]),
                               np.asarray(outs["conv"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["conv"]), atol=2e-5)
    forced = tsconv_stage1(x, w, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(forced), np.asarray(outs["conv"]))
