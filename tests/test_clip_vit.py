"""CLIP tower tests (tiny configs): shapes, EOT pooling, causal text mask,
grid output for GIT, preprocessing constants."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.models.clip_vit import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_preprocess,
    encode_images_jax,
)


def test_vision_tower_shapes(rng):
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = tower.init(jax.random.key(0), imgs)["params"]
    feats = tower.apply({"params": params}, imgs)
    assert feats.shape == (2, cfg.embed_dim)
    grid = tower.apply({"params": params}, imgs, return_grid=True)
    assert grid.shape == (2, 1 + (32 // 8) ** 2, cfg.width)
    normed = encode_images_jax(tower, params, imgs)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed), axis=1), 1.0, rtol=1e-5
    )


def test_text_tower_eot_pooling(rng):
    cfg = CLIPTextConfig.tiny()
    tower = CLIPTextTower(cfg)
    # EOT token = highest id; place it at different positions
    toks = jnp.asarray([[5, 9, 63, 0, 0, 0], [5, 9, 11, 30, 63, 0]], jnp.int32)
    params = tower.init(jax.random.key(0), toks)["params"]
    feats = tower.apply({"params": params}, toks)
    assert feats.shape == (2, cfg.embed_dim)
    # tokens AFTER the EOT must not affect the pooled feature (causal mask)
    toks2 = toks.at[0, 4].set(7)
    feats2 = tower.apply({"params": params}, toks2)
    np.testing.assert_allclose(
        np.asarray(feats[0]), np.asarray(feats2[0]), atol=1e-5
    )
    # tokens BEFORE the EOT must affect it
    toks3 = toks.at[0, 1].set(7)
    feats3 = tower.apply({"params": params}, toks3)
    assert not np.allclose(np.asarray(feats[0]), np.asarray(feats3[0]))


def test_real_config_shapes():
    """ViT-H/14 param count sanity: ~630M vision params."""
    cfg = CLIPVisionConfig.vit_h_14()
    assert cfg.width == 1280 and cfg.layers == 32 and cfg.embed_dim == 1024
    n_per_block = 4 * cfg.width**2 + 2 * cfg.width * 4 * cfg.width
    total = cfg.layers * n_per_block
    assert 550e6 < total < 750e6


def test_clip_preprocess_range():
    imgs = jnp.ones((1, 4, 4, 3)) * 0.5
    out = clip_preprocess(imgs)
    assert out.shape == imgs.shape
    assert float(jnp.abs(out).max()) < 1.0
