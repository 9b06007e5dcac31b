"""Fused projection-head kernel: parity vs the jnp reference (interpret
mode — these run on CPU; on-chip timing lives in scripts/bench_projection.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.ops.projection import (
    fused_projection_head,
    projection_head_reference,
)


def _params(rng, d_in, d_out, dtype):
    return {
        "wi": jnp.asarray(rng.normal(size=(d_in, d_out)) * 0.05, dtype),
        "bi": jnp.asarray(rng.normal(size=(d_out,)) * 0.1, dtype),
        "wr": jnp.asarray(rng.normal(size=(d_out, d_out)) * 0.05, dtype),
        "br": jnp.asarray(rng.normal(size=(d_out,)) * 0.1, dtype),
        "ln_s": jnp.asarray(1.0 + rng.normal(size=(d_out,)) * 0.1, dtype),
        "ln_b": jnp.asarray(rng.normal(size=(d_out,)) * 0.1, dtype),
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("batch", [32, 41])  # 41: pad path
def test_forward_matches_reference(dtype, batch):
    rng = np.random.default_rng(0)
    d_in, d_out = 96, 64
    x = jnp.asarray(rng.normal(size=(batch, d_in)), dtype)
    params = _params(rng, d_in, d_out, dtype)
    out = fused_projection_head(x, params, interpret=True)
    ref = projection_head_reference(x, params)
    assert out.dtype == jnp.float32 and out.shape == (batch, d_out)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_forward_with_dropout_mask():
    rng = np.random.default_rng(1)
    d_in, d_out, B = 80, 48, 24
    x = jnp.asarray(rng.normal(size=(B, d_in)), jnp.float32)
    params = _params(rng, d_in, d_out, jnp.float32)
    mask = jnp.asarray(
        (rng.random((B, d_out)) > 0.5).astype(np.float32) * 2.0
    )
    out = fused_projection_head(x, params, mask, 0.0, True)
    ref = projection_head_reference(x, params, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # mask actually changes the output
    out0 = fused_projection_head(x, params, interpret=True)
    assert float(np.abs(np.asarray(out - out0)).max()) > 1e-3


@pytest.mark.parametrize("with_mask", [False, True])
def test_grads_match_reference(with_mask):
    rng = np.random.default_rng(2)
    d_in, d_out, B = 96, 64, 40
    x = jnp.asarray(rng.normal(size=(B, d_in)), jnp.float32)
    params = _params(rng, d_in, d_out, jnp.float32)
    mask = (
        jnp.asarray((rng.random((B, d_out)) > 0.5).astype(np.float32) * 2.0)
        if with_mask else None
    )

    def loss_fused(x, p):
        return jnp.sum(
            jnp.square(fused_projection_head(x, p, mask, 0.0, True))
        )

    def loss_ref(x, p):
        return jnp.sum(jnp.square(projection_head_reference(x, p, mask)))

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    for k in gp_r:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_r[k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )


def test_grad_accumulates_across_grid_blocks():
    """Param grads sum over batch tiles: a 3-block batch must equal the sum
    of per-block grads (exercises the sequential-grid accumulation)."""
    import eeg_image_decode_tpu.ops.projection as proj

    rng = np.random.default_rng(3)
    d_in, d_out = 64, 32
    params = _params(rng, d_in, d_out, jnp.float32)
    old = proj.BLOCK_BT
    proj.BLOCK_BT = 8
    try:
        x = jnp.asarray(rng.normal(size=(24, d_in)), jnp.float32)

        def loss(p, xx):
            return jnp.sum(
                jnp.square(fused_projection_head(xx, p, None, 0.0, True))
            )

        gp_all = jax.grad(loss)(params, x)
        gp_sum = jax.tree_util.tree_map(
            lambda a, b, c: a + b + c,
            jax.grad(loss)(params, x[:8]),
            jax.grad(loss)(params, x[8:16]),
            jax.grad(loss)(params, x[16:]),
        )
        for k in gp_all:
            np.testing.assert_allclose(
                np.asarray(gp_all[k]), np.asarray(gp_sum[k]),
                rtol=1e-4, atol=1e-4, err_msg=k,
            )
    finally:
        proj.BLOCK_BT = old


def test_reference_matches_flax_head_modulo_gelu():
    """The kernel's math = models.layers.ProjectionHead up to the documented
    tanh-vs-erf GELU difference (fp32, no dropout)."""
    from eeg_image_decode_tpu.models.layers import ProjectionHead

    rng = np.random.default_rng(4)
    d_in, d_out, B = 96, 64, 16
    x = jnp.asarray(rng.normal(size=(B, d_in)), jnp.float32)
    head = ProjectionHead(proj_dim=d_out, dropout=0.0, dtype=jnp.float32)
    variables = head.init(jax.random.key(0), x, deterministic=True)
    p = variables["params"]
    kparams = {
        "wi": p["in_proj"]["kernel"], "bi": p["in_proj"]["bias"],
        "wr": p["res_proj"]["kernel"], "br": p["res_proj"]["bias"],
        "ln_s": p["ln"]["scale"], "ln_b": p["ln"]["bias"],
    }
    ref = projection_head_reference(x, kparams)
    flax_out = head.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out),
                               rtol=5e-3, atol=5e-3)


def test_model_level_fused_projection_matches_xla():
    """Full ATM-S forward: fused projection head (interpret) vs XLA path on
    the SAME variables — one checkpoint tree serves both."""
    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder

    rng = np.random.default_rng(5)
    eeg = jnp.asarray(rng.normal(size=(4, 63, 250)), jnp.float32)
    sid = jnp.ones((4,), jnp.int32)
    base = build_encoder("atms", config=ATMSConfig(fused_projection=False))
    variables = base.init(jax.random.key(0), eeg, sid, deterministic=True)
    out_xla, _ = base.apply(variables, eeg, sid, deterministic=True)

    fused = build_encoder("atms", config=ATMSConfig(fused_projection=True))
    out_fused, _ = fused.apply(variables, eeg, sid, deterministic=True)
    # tanh-vs-erf GELU is the only difference (documented |Δ| ≲ 1e-3 pre-LN)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=0, atol=5e-3)


def test_in_kernel_prng_dropout_deterministic_and_seed_sensitive():
    """Seed-mode dropout (TPU-only: the hardware PRNG has no CPU-interpret
    implementation). Same seed → identical output (fwd and bwd draw the same
    masks); different seed → different output; masked magnitudes consistent
    with keep-prob 0.5 rescaling."""
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG requires a real TPU")
    rng = np.random.default_rng(6)
    d_in, d_out, B = 96, 64, 32
    x = jnp.asarray(rng.normal(size=(B, d_in)), jnp.float32)
    params = _params(rng, d_in, d_out, jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)

    def f(x, s):
        return fused_projection_head(x, params, None, 0.5, False, s)

    a, b = f(x, seed), f(x, seed)
    c = f(x, jnp.asarray(999, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # grads flow and are deterministic under the same seed
    g1 = jax.grad(lambda xx: jnp.sum(f(xx, seed) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(f(xx, seed) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
