"""SDXL text-conditioning parity vs transformers CLIP text models.

Pins that the flax towers + converter reproduce transformers'
``CLIPTextModel``/``CLIPTextModelWithProjection`` numerics (penultimate
hidden state, final state, projected pooled output) and that the dual
encoder composes them exactly like diffusers ``encode_prompt``
(ref ``Generation/custom_pipeline.py:239-254``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.gen.text_encoder import (
    SDXLTextEncoder,
    SDXLTextEncoderConfig,
    convert_hf_clip_text,
    convert_sdxl_text_encoders,
)
from eeg_image_decode_tpu.models.clip_vit import CLIPTextConfig, CLIPTextTower

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

V, L = 64, 12


def _hf_text_model(act: str, *, projection: bool, seed: int):
    cfg = transformers.CLIPTextConfig(
        vocab_size=V, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=L, hidden_act=act, projection_dim=32,
        eos_token_id=V - 1,  # HF pools at this id; our EOT is the max id
    )
    torch.manual_seed(seed)
    cls = (transformers.CLIPTextModelWithProjection if projection
           else transformers.CLIPTextModel)
    return cls(cfg).eval()


def _ids(rng, b=3):
    """Random ids with the max id (EOT stand-in) at a fixed position per row,
    so both implementations pool at the same token."""
    ids = rng.integers(1, V - 2, size=(b, L))
    for i, pos in enumerate((4, 7, L - 1)[:b]):
        ids[i, pos] = V - 1
        ids[i, pos + 1 :] = 0
    return ids.astype(np.int32)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_tower_matches_transformers(act, rng):
    hf = _hf_text_model(act, projection=True, seed=0)
    cfg = CLIPTextConfig.tiny(act=act)
    tower = CLIPTextTower(cfg)
    params = convert_hf_clip_text(hf.state_dict(), cfg)
    ids = _ids(rng)

    with torch.no_grad():
        out = hf(torch.tensor(ids.astype(np.int64)), output_hidden_states=True)
    ref_penult = out.hidden_states[-2].numpy()
    ref_final = hf.text_model.final_layer_norm(
        out.hidden_states[-1]
    ).detach().numpy()
    ref_pooled = out.text_embeds.numpy()

    got = tower.apply({"params": params}, jnp.asarray(ids),
                      return_states=True)
    np.testing.assert_allclose(np.asarray(got["penultimate"]), ref_penult,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["final"]), ref_final,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["pooled"]), ref_pooled,
                               atol=2e-5, rtol=1e-4)


def test_tower_without_projection_uses_identity(rng):
    """SDXL's text_encoder has no projection head; converter must still give
    a working tower (identity projection, pooled == LN'd EOT feature)."""
    hf = _hf_text_model("quick_gelu", projection=False, seed=1)
    cfg = CLIPTextConfig.tiny()
    params = convert_hf_clip_text(hf.state_dict(), cfg)
    ids = _ids(rng)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).pooler_output.numpy()
    got = CLIPTextTower(cfg).apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_dual_encoder_matches_diffusers_composition(rng):
    """context = concat(penultimate_1, penultimate_2); pooled = tower-2
    projected EOT — diffusers encode_prompt with clip_skip=None."""
    hf1 = _hf_text_model("quick_gelu", projection=False, seed=2)
    hf2 = _hf_text_model("gelu", projection=True, seed=3)
    cfg = SDXLTextEncoderConfig.tiny()
    enc = SDXLTextEncoder(cfg)
    params = convert_sdxl_text_encoders(hf1.state_dict(), hf2.state_dict(),
                                        cfg)
    ids1, ids2 = _ids(rng), _ids(rng)
    with torch.no_grad():
        o1 = hf1(torch.tensor(ids1.astype(np.int64)),
                 output_hidden_states=True)
        o2 = hf2(torch.tensor(ids2.astype(np.int64)),
                 output_hidden_states=True)
    ref_ctx = np.concatenate(
        [o1.hidden_states[-2].numpy(), o2.hidden_states[-2].numpy()], axis=-1
    )
    ref_pooled = o2.text_embeds.numpy()

    ctx, pooled = enc.encode_tokens(params, jnp.asarray(ids1),
                                    jnp.asarray(ids2))
    assert ctx.shape == (3, L, cfg.context_dim)
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-5,
                               rtol=1e-4)


def test_encode_via_tokenizers(tmp_path, rng):
    """Host wrapper: prompts → both tokenizers → one jitted encode."""
    import json

    from eeg_image_decode_tpu.data.tokenizers import (
        CLIPBPETokenizer,
        bytes_to_unicode,
    )

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
    tok1 = CLIPBPETokenizer.from_files(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        context_length=12,
    )
    tok2 = CLIPBPETokenizer.from_files(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        context_length=12, pad_token="!",
    )
    cfg = SDXLTextEncoderConfig(
        clip_l=CLIPTextConfig(vocab_size=len(vocab), context_length=12,
                              width=32, layers=2, heads=2, embed_dim=32),
        big_g=CLIPTextConfig(vocab_size=len(vocab), context_length=12,
                             width=32, layers=2, heads=2, embed_dim=32,
                             act="gelu"),
    )
    enc = SDXLTextEncoder(cfg)
    params = enc.init(jax.random.key(0))
    ctx, pooled = enc.encode(params, ["", "cat"], tok1, tok2)
    assert ctx.shape == (2, 12, 64) and pooled.shape == (2, 32)
    assert np.isfinite(np.asarray(ctx)).all()
    # '' conditioning must NOT be the zero vector the old path substituted
    assert np.abs(np.asarray(ctx[0])).max() > 0


def test_generator_uses_default_text_conditioning():
    """Installed ''-prompt embeddings change the sample vs zero context."""
    from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig

    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    emb = jnp.ones((2, gen.config.unet.ip_image_embed_dim))
    key = jax.random.key(42)
    base = gen.generate(emb, key=key, num_inference_steps=2)

    ctx = 0.5 * jnp.ones((1, gen.config.text_len,
                          gen.config.unet.cross_attention_dim))
    gen.set_default_text_conditioning(ctx)
    conditioned = gen.generate(emb, key=key, num_inference_steps=2)
    assert conditioned.shape == base.shape
    assert not np.allclose(np.asarray(conditioned), np.asarray(base))
