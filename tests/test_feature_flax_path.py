"""Torch-free CLIP feature caching (VERDICT item 6).

The reference's datasets hard-require open_clip at import to build the
ViT-H feature caches (``Retrieval/eegdatasets_leaveone.py:18-21,296-324``).
Here the same cache builds end-to-end through the flax towers + native BPE
tokenizer — open_clip is NOT installed in this image, which is exactly the
scenario under test. Vision-tower conversion parity is pinned against
``transformers.CLIPVisionModelWithProjection``.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.data.features import (
    FlaxCLIPFeatureEncoder,
    load_features,
    load_or_compute_clip_features,
)
from eeg_image_decode_tpu.data.tokenizers import (
    CLIPBPETokenizer,
    bytes_to_unicode,
)
from eeg_image_decode_tpu.models.clip_vit import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
)


def _write_images(tmp_path, n=5, size=40):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _tiny_tokenizer(tmp_path):
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    return CLIPBPETokenizer.from_files(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        context_length=16,
    ), len(vocab)


def test_cache_builds_without_open_clip(tmp_path):
    with pytest.raises(ImportError):
        import open_clip  # noqa: F401 — this env must NOT have it

    paths = _write_images(tmp_path)
    tok, vocab_size = _tiny_tokenizer(tmp_path)
    vcfg = CLIPVisionConfig.tiny()
    tcfg = CLIPTextConfig(vocab_size=vocab_size, context_length=16, width=32,
                          layers=2, heads=2, embed_dim=vcfg.embed_dim)
    vt, tt = CLIPVisionTower(vcfg), CLIPTextTower(tcfg)
    vp = vt.init(jax.random.key(0),
                 jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]
    tp = tt.init(jax.random.key(1), jnp.zeros((1, 16), jnp.int32))["params"]
    enc = FlaxCLIPFeatureEncoder(vt, vp, tt, tp, tok)

    prompts = [f"This picture is thing{i}" for i in range(3)]
    out = load_or_compute_clip_features(
        str(tmp_path / "cache"), "train", paths, prompts,
        flax_encoder=enc, batch_size=2,
    )
    assert out["img_features"].shape == (5, vcfg.embed_dim)
    assert out["text_features"].shape == (3, vcfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(out["img_features"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out["text_features"], axis=-1), 1.0, atol=1e-5)
    # second call hits the cache (no encoder needed at all)
    again = load_or_compute_clip_features(
        str(tmp_path / "cache"), "train", paths, prompts)
    np.testing.assert_array_equal(again["img_features"], out["img_features"])


def test_without_encoder_raises_actionable_error(tmp_path):
    paths = _write_images(tmp_path, n=2)
    with pytest.raises(ImportError, match="flax_encoder"):
        load_or_compute_clip_features(
            str(tmp_path / "cache"), "train", paths, ["a"])


def test_unnormalized_image_features(tmp_path):
    """normalize_img=False gives the generation pipeline's raw embeddings."""
    paths = _write_images(tmp_path, n=3)
    tok, vocab_size = _tiny_tokenizer(tmp_path)
    vcfg = CLIPVisionConfig.tiny()
    tcfg = CLIPTextConfig(vocab_size=vocab_size, context_length=16, width=32,
                          layers=2, heads=2, embed_dim=vcfg.embed_dim)
    vt, tt = CLIPVisionTower(vcfg), CLIPTextTower(tcfg)
    vp = vt.init(jax.random.key(0),
                 jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]
    tp = tt.init(jax.random.key(1), jnp.zeros((1, 16), jnp.int32))["params"]
    enc = FlaxCLIPFeatureEncoder(vt, vp, tt, tp, tok)
    raw = enc.encode_images(paths, normalize=False, batch_size=2)
    norms = np.linalg.norm(raw, axis=-1)
    assert not np.allclose(norms, 1.0)


def test_vision_tower_matches_transformers(rng):
    """convert_hf_clip_vision + CLIPVisionTower ≡ transformers
    CLIPVisionModelWithProjection (pooled/projected output)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from eeg_image_decode_tpu.utils.convert_clip import convert_hf_clip_vision

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=24, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=2,
                           heads=2, embed_dim=24, act="quick_gelu")
    params = convert_hf_clip_vision(hf.state_dict(), cfg)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).image_embeds
    got = CLIPVisionTower(cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5,
                               rtol=1e-4)
