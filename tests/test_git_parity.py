"""GIT captioner parity vs transformers ``GitForCausalLM``.

The reference vendors this exact torch model (``Generation/modeling_git.py``,
``GitForCausalLMClipEmb`` = ``GitForCausalLM`` with the vision tower swapped
for precomputed CLIP grids). A tiny random-init torch oracle is converted and
must match: forward logits, the vision tower grid, the PixelProjector
layout, and greedy decode token-for-token.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eeg_image_decode_tpu.models.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionTower,
)
from eeg_image_decode_tpu.models.git_caption import (
    GITCaptioner,
    GITConfig,
    PixelProjector,
    convert_git_causal_lm,
    convert_pixel_projector,
)
from eeg_image_decode_tpu.utils.convert_clip import convert_hf_clip_vision

V_TOKENS = 5  # (32/16)² + 1


def _tiny_pair(seed=0):
    vis_cfg = transformers.GitVisionConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=16,
    )
    hf_cfg = transformers.GitConfig(
        vision_config=vis_cfg.to_dict(), vocab_size=64, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(seed)
    hf = transformers.GitForCausalLM(hf_cfg).eval()
    cfg = GITConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=2, d_ff=64,
        max_position_embeddings=16, max_text_len=8, num_visual_tokens=V_TOKENS,
        visual_dim=16, bos_token_id=1, eos_token_id=2,
    )
    model = GITCaptioner(cfg)
    params = convert_git_causal_lm(hf.state_dict(), cfg)
    return hf, cfg, model, params


def _grids(hf, rng, b=2):
    """Visual tokens from the torch vision tower (what GitForCausalLMClipEmb
    consumes as ``pixel_values``)."""
    px = torch.tensor(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    with torch.no_grad():
        grid = hf.git.image_encoder(px).last_hidden_state
    return px, grid


def test_forward_logits_match(rng):
    hf, cfg, model, params = _tiny_pair()
    px, grid = _grids(hf, rng)
    ids = rng.integers(3, 64, size=(2, 6)).astype(np.int64)
    ids[:, 0] = cfg.bos_token_id
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), pixel_values=px)
    ref = out.logits[:, V_TOKENS:].numpy()
    got = model.apply({"params": params}, jnp.asarray(grid.numpy()),
                      jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5, rtol=1e-4)


def test_vision_tower_grid_matches(rng):
    """Our CLIPVisionTower (quick_gelu) + convert_hf_clip_vision must equal
    the GIT image encoder's grid output (post-LN on all tokens)."""
    hf, *_ = _tiny_pair()
    vcfg = CLIPVisionConfig(image_size=32, patch_size=16, width=16, layers=1,
                            heads=2, embed_dim=16, act="quick_gelu")
    sd = {k[len("git.image_encoder."):]: v
          for k, v in hf.state_dict().items()
          if k.startswith("git.image_encoder.")}
    vparams = convert_hf_clip_vision(sd, vcfg)
    px, grid = _grids(hf, rng)
    tower = CLIPVisionTower(vcfg)
    imgs = np.transpose(px.numpy(), (0, 2, 3, 1))  # NCHW → NHWC
    got = tower.apply({"params": vparams}, jnp.asarray(imgs),
                      return_grid=True)
    np.testing.assert_allclose(np.asarray(got), grid.numpy(), atol=5e-5,
                               rtol=1e-4)


def test_greedy_decode_matches_hf_generate(rng):
    hf, cfg, model, params = _tiny_pair(seed=3)
    px, grid = _grids(hf, rng, b=3)
    bos = torch.full((3, 1), cfg.bos_token_id, dtype=torch.long)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=bos, pixel_values=px, max_new_tokens=6,
            do_sample=False, num_beams=1,
        ).numpy()
    got = np.asarray(model.generate(
        {"params": params}, jnp.asarray(grid.numpy()), max_new_tokens=6
    ))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # token-for-token up to (and including) each row's EOS
    for r in range(3):
        ref_row, got_row = ref[r].tolist(), got[r].tolist()
        if cfg.eos_token_id in ref_row:
            n = ref_row.index(cfg.eos_token_id) + 1
        else:
            n = len(ref_row)
        assert got_row[:n] == ref_row[:n], (r, got_row, ref_row)


def test_pixel_projector_converts_from_reference_layout(rng):
    """Torch oracle of image_adapter.ipynb cell 3's Sequential."""
    D, T = 16, 5
    sd = {
        "1.weight": rng.normal(size=(T, 1)).astype(np.float32),
        "1.bias": rng.normal(size=(T,)).astype(np.float32),
        "2.weight": np.abs(rng.normal(size=(T,)).astype(np.float32)) + 0.5,
        "2.bias": rng.normal(size=(T,)).astype(np.float32),
        "4.weight": rng.normal(size=(D, D)).astype(np.float32),
        "4.bias": rng.normal(size=(D,)).astype(np.float32),
        "5.weight": np.abs(rng.normal(size=(D,)).astype(np.float32)) + 0.5,
        "5.bias": rng.normal(size=(D,)).astype(np.float32),
    }
    x = rng.normal(size=(4, D)).astype(np.float32)

    t = {k: torch.tensor(v) for k, v in sd.items()}
    xt = torch.tensor(x)[:, :, None]  # (B, D, 1) — 'B C L -> B L C' on (B,1,D)
    h = torch.nn.functional.linear(xt, t["1.weight"], t["1.bias"])  # (B, D, T)
    h = torch.nn.functional.layer_norm(h, (T,), t["2.weight"], t["2.bias"])
    h = h.transpose(1, 2)  # (B, T, D)
    h = torch.nn.functional.linear(h, t["4.weight"], t["4.bias"])
    ref = torch.nn.functional.layer_norm(
        h, (D,), t["5.weight"], t["5.bias"]
    ).numpy()

    proj = PixelProjector(num_tokens=T, out_dim=D)
    got = proj.apply({"params": convert_pixel_projector(sd)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_converter_rejects_truncating_config():
    """A checkpoint with MORE layers than the config must raise — the
    silent-truncation path (convert a git-large sd under a git-base config
    and decode garbage) is forbidden."""
    hf_cfg = transformers.GitConfig(
        vision_config=transformers.GitVisionConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, image_size=32, patch_size=16,
        ).to_dict(),
        vocab_size=64, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16,
    )
    torch.manual_seed(0)
    sd = transformers.GitForCausalLM(hf_cfg).state_dict()
    small = GITConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                      d_ff=64, max_position_embeddings=16, visual_dim=16)
    with pytest.raises(ValueError, match="n_layers"):
        convert_git_causal_lm(sd, small)
    # wrong width must raise too (the actual git-large-under-base failure)
    wide = GITConfig(vocab_size=64, d_model=64, n_layers=3, n_heads=2,
                     d_ff=64, max_position_embeddings=16, visual_dim=16)
    with pytest.raises(ValueError, match="d_model"):
        convert_git_causal_lm(sd, wide)


def test_converter_derives_config_from_checkpoint(rng):
    """cfg=None: every decoder dim comes from the weights; forward parity
    holds without any preset. Uses 64-wide heads (GIT's invariant across
    released sizes) so head inference applies."""
    from eeg_image_decode_tpu.models.git_caption import (
        git_config_from_params,
        git_config_from_state_dict,
    )

    hf_cfg = transformers.GitConfig(
        vision_config=transformers.GitVisionConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, image_size=32, patch_size=16,
        ).to_dict(),
        vocab_size=64, hidden_size=128, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=96,
        max_position_embeddings=16, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(1)
    hf = transformers.GitForCausalLM(hf_cfg).eval()
    derived = git_config_from_state_dict(hf.state_dict())
    assert (derived.vocab_size, derived.d_model, derived.n_layers,
            derived.n_heads, derived.d_ff, derived.visual_dim,
            derived.max_position_embeddings) == (64, 128, 3, 2, 96, 16, 16)
    params = convert_git_causal_lm(hf.state_dict())  # cfg=None path
    # the converted-params derivation agrees (heads read off the qkv fold)
    rt = git_config_from_params(params)
    assert (rt.d_model, rt.n_layers, rt.n_heads, rt.d_ff) == (128, 3, 2, 96)
    model = GITCaptioner(derived)
    px, grid = _grids(hf, rng)
    ids = rng.integers(3, 64, size=(2, 5)).astype(np.int64)
    ids[:, 0] = 1
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=px).logits[:, V_TOKENS:].numpy()
    got = model.apply({"params": params}, jnp.asarray(grid.numpy()),
                      jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5, rtol=1e-4)


def test_git_large_coco_dims():
    """The preset must match microsoft/git-large-coco's config.json (1024-
    wide, 6 layers, 16 heads, 4096 FFN — GIT scales width + vision tower,
    not decoder depth)."""
    cfg = GITConfig.git_large_coco()
    assert (cfg.d_model, cfg.n_layers, cfg.n_heads, cfg.d_ff) == (
        1024, 6, 16, 4096)
    assert (cfg.num_visual_tokens, cfg.visual_dim) == (257, 1024)
    base = GITConfig.git_base()
    assert (base.d_model, base.n_layers, base.n_heads, base.d_ff) == (
        768, 6, 12, 3072)


def test_caption_pipeline_emits_text(rng):
    """End-to-end: CLIP embed → projector → greedy GIT → WordPiece decode."""
    from eeg_image_decode_tpu.data.tokenizers import WordPieceTokenizer
    from eeg_image_decode_tpu.models.git_caption import caption_embeddings

    vocab = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + [f"w{i}" for i in range(60)]
    tok = WordPieceTokenizer(vocab)
    cfg = GITConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=2, d_ff=64,
        max_position_embeddings=16, max_text_len=8, num_visual_tokens=V_TOKENS,
        visual_dim=16, bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    model = GITCaptioner(cfg)
    emb = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    proj = PixelProjector(num_tokens=V_TOKENS, out_dim=16)
    pp = proj.init(jax.random.key(0), emb)["params"]
    grids = proj.apply({"params": pp}, emb)
    variables = model.init(jax.random.key(1), grids,
                           jnp.zeros((2, 4), jnp.int32))
    caps = caption_embeddings(model, variables, pp, emb, tok,
                              max_new_tokens=5)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
