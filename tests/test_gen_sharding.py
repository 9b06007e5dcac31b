"""Tensor-parallel SDXL sharding on the virtual mesh: a dp×mp-sharded UNet
forward must equal the unsharded forward."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from eeg_image_decode_tpu.core.mesh import create_mesh
from eeg_image_decode_tpu.gen.sharding import (
    param_sharding_rules,
    shard_params,
    sharded_unet_apply,
)
from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig


def _tiny():
    cfg = SDXLUNetConfig.tiny()
    model = SDXLUNet(cfg, dtype=jnp.float32)
    lat = jnp.zeros((4, 8, 8, 4))
    ctx = jnp.zeros((4, 4, cfg.cross_attention_dim))
    emb = jnp.zeros((4, cfg.ip_image_embed_dim))
    params = model.init(jax.random.key(0), lat, jnp.zeros((4,), jnp.int32),
                        ctx, None, None, emb)["params"]
    return cfg, model, params


def test_rules_shard_feature_axes():
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    _, _, params = _tiny()
    rules = param_sharding_rules(mesh, params)
    # conv_in kernel (3,3,4,32): 32 % 4 == 0 → sharded on last axis
    s = rules["conv_in"]["kernel"]
    assert s.spec == P(None, None, None, "mp")
    # biases replicate
    assert rules["conv_in"]["bias"].spec == P()


def test_tp_forward_matches_unsharded(rng):
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    cfg, model, params = _tiny()
    lat = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(4, 4, cfg.cross_attention_dim)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(4, cfg.ip_image_embed_dim)).astype(np.float32))
    t = jnp.asarray([0, 100, 500, 900])

    want = model.apply({"params": params}, lat, t, ctx, None, None, emb)

    tp_params = shard_params(mesh, params)
    fwd = sharded_unet_apply(model, mesh)
    got = fwd(tp_params, lat, t, ctx, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
