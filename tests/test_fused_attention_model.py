"""ATMS with the fused attention layer forced on (interpret mode on CPU):
eval must match the XLA path; train mode must run with in-kernel dropout."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ATMSConfig
from eeg_image_decode_tpu.models import build_encoder

CFG_KW = dict(seq_len=64, d_model=64, temporal_kernel=9, pool_size=16,
              pool_stride=4, proj_dim=48)


def test_fused_model_eval_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(4, 63, 64)).astype(np.float32))
    sids = jnp.zeros((4,), jnp.int32)
    m_x = build_encoder("atms", config=ATMSConfig(fused_attention=False, **CFG_KW))
    m_f = build_encoder("atms", config=ATMSConfig(fused_attention=True, **CFG_KW))
    v = m_x.init(jax.random.key(0), x, sids, deterministic=True)
    fx, _ = m_x.apply(v, x, sids, deterministic=True)
    ff, _ = m_f.apply(v, x, sids, deterministic=True)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fx),
                               atol=1e-4, rtol=1e-3)


def test_fused_flag_training_falls_back_to_xla(rng):
    """With dropout active the layer (by design) routes to the XLA path even
    when fused is requested — training must still work end to end."""
    from eeg_image_decode_tpu.losses import clip_loss

    x = jnp.asarray(rng.normal(size=(8, 63, 64)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 48)).astype(np.float32))
    sids = jnp.zeros((8,), jnp.int32)
    model = build_encoder("atms", config=ATMSConfig(fused_attention=True, **CFG_KW))
    v = model.init(jax.random.key(0), x, sids, deterministic=True)

    def loss_fn(params, key):
        (f, s), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, sids, deterministic=False,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return clip_loss(f, y, s)

    l1, g = jax.value_and_grad(loss_fn)(v["params"], jax.random.key(1))
    assert np.isfinite(float(l1))
    # dropout keys change the loss (masks live)
    l2 = loss_fn(v["params"], jax.random.key(2))
    assert float(l1) != float(l2)
    # grads reach the attention params through the custom VJP
    attn_g = g["encoder"]["encoder_layer_0"]["q_proj"]["kernel"]
    assert float(jnp.max(jnp.abs(attn_g))) > 0
