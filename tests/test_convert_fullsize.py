"""Full-size converter rehearsal — the complete checkpoint key sets at REAL
shapes, through every converter, with full-coverage accounting.

The tiny torch-oracle parity tests pin the conversion *math*; this file pins
the conversion *grammar at scale*: a naming mismatch that only appears at
full depth (e.g. ``down_blocks.2.attentions.1.transformer_blocks.9.*``) or a
checkpoint key our models don't account for would pass the tiny suite and
fail on the real weights. Strategy per checkpoint family:

- **SDXL-turbo UNet / SDXL VAE / OpenCLIP ViT-H / IP-Adapter**: the key
  grammar is hand-enumerated here (diffusers/OpenCLIP are not installed),
  INDEPENDENTLY of ``gen/convert.py``, and cross-validated at tiny scale
  against the independent torch oracles in ``test_sdxl_torch_parity.py``
  (``TTinySDXLUNet.state_dict()`` etc.). The same enumerator then emits the
  full-size checkpoint (``sdxl_turbo()`` — three stages, depth (0,2,10),
  2.57B params), which is synthesized as fp16 arrays and converted.
- **SDXL dual text encoders / git-large-coco**: transformers IS installed,
  so the authoritative grammar comes from instantiating the real model
  classes (``CLIPTextModel(WithProjection)``, ``GitForCausalLM``) at the
  real configs on the meta device (shapes only, no RAM).

Assertions for every converter run:

(a) every checkpoint key is consumed — total checkpoint elements equal total
    converted-tree elements (± documented identity injections), so a key the
    converter silently skips breaks the accounting;
(b) every flax param is initialized at the right shape — the converted
    tree's {path: shape} map equals ``jax.eval_shape`` of the model's init,
    exactly, both directions;
(c) a KeyError during conversion means the converter wants a key the real
    grammar doesn't have.

The on-chip bf16 *execution* of the converted full-size graphs is
``scripts/rehearse_fullsize.py`` (results recorded in docs/PERF.md); here on
CPU we stop at conversion + shape validation.

Reference flows exercised: ``Generation/custom_pipeline.py:456-470`` (SDXL
turbo + IP-Adapter load), ``modeling_git.py:1567`` (GIT), the module-level
OpenCLIP load (``Retrieval/eegdatasets_leaveone.py:18-21``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from eeg_image_decode_tpu.gen.convert import convert_sdxl_unet, convert_sdxl_vae
from eeg_image_decode_tpu.gen.text_encoder import (
    SDXLTextEncoder,
    SDXLTextEncoderConfig,
    convert_sdxl_text_encoders,
)
from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig
from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig
from eeg_image_decode_tpu.models.clip_vit import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
)
from eeg_image_decode_tpu.models.git_caption import (
    GITCaptioner,
    GITConfig,
    convert_git_causal_lm,
)
from eeg_image_decode_tpu.utils.convert_clip import (
    convert_hf_clip_vision,
    convert_openclip_text,
    convert_openclip_vision,
)

# ——————————————————— helpers ———————————————————


def _shape_map(tree) -> dict:
    return {
        jtu.keystr(p): tuple(v.shape)
        for p, v in jtu.tree_leaves_with_path(tree)
    }


def _total(spec: dict) -> int:
    return int(sum(np.prod(s, dtype=np.int64) for s in spec.values()))


def _tree_total(tree) -> int:
    return int(
        sum(np.prod(v.shape, dtype=np.int64) for v in jtu.tree_leaves(tree))
    )


def _synth(spec: dict, dtype=np.float16) -> dict:
    """Checkpoint-shaped dict of zeros (np.zeros is lazily allocated, so the
    multi-GB full-size dicts cost RAM only where converters copy)."""
    return {k: np.zeros(s, dtype) for k, s in spec.items()}


def _assert_same_shapes(converted, expected, label):
    got, want = _shape_map(converted), _shape_map(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{label}: missing={missing[:6]} extra={extra[:6]}"
    )
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{label}: shape mismatches {dict(list(bad.items())[:6])}"


# ——————————— diffusers UNet2DConditionModel checkpoint grammar ———————————


def _conv(d, p, cout, cin, k):
    d[f"{p}.weight"] = (cout, cin, k, k)
    d[f"{p}.bias"] = (cout,)


def _lin(d, p, cout, cin, bias=True):
    d[f"{p}.weight"] = (cout, cin)
    if bias:
        d[f"{p}.bias"] = (cout,)


def _norm(d, p, c):
    d[f"{p}.weight"] = (c,)
    d[f"{p}.bias"] = (c,)


def _resnet(d, p, cin, cout, tdim):
    _norm(d, f"{p}.norm1", cin)
    _conv(d, f"{p}.conv1", cout, cin, 3)
    _lin(d, f"{p}.time_emb_proj", cout, tdim)
    _norm(d, f"{p}.norm2", cout)
    _conv(d, f"{p}.conv2", cout, cout, 3)
    if cin != cout:
        _conv(d, f"{p}.conv_shortcut", cout, cin, 1)


def _transformer(d, p, ch, depth, ctx, head_dim):
    inner = max(ch // head_dim, 1) * head_dim
    _norm(d, f"{p}.norm", ch)
    _lin(d, f"{p}.proj_in", ch, ch)
    for k in range(depth):
        b = f"{p}.transformer_blocks.{k}"
        _norm(d, f"{b}.norm1", ch)
        _lin(d, f"{b}.attn1.to_q", inner, ch, bias=False)
        _lin(d, f"{b}.attn1.to_k", inner, ch, bias=False)
        _lin(d, f"{b}.attn1.to_v", inner, ch, bias=False)
        _lin(d, f"{b}.attn1.to_out.0", ch, inner)
        _norm(d, f"{b}.norm2", ch)
        _lin(d, f"{b}.attn2.to_q", inner, ch, bias=False)
        _lin(d, f"{b}.attn2.to_k", inner, ctx, bias=False)
        _lin(d, f"{b}.attn2.to_v", inner, ctx, bias=False)
        _lin(d, f"{b}.attn2.to_out.0", ch, inner)
        _norm(d, f"{b}.norm3", ch)
        _lin(d, f"{b}.ff.net.0.proj", 8 * ch, ch)
        _lin(d, f"{b}.ff.net.2", ch, 4 * ch)
    _lin(d, f"{p}.proj_out", ch, ch)


def unet_checkpoint_spec(cfg: SDXLUNetConfig) -> dict:
    """Complete ``UNet2DConditionModel.state_dict()`` key→shape map for this
    config, following the diffusers naming grammar."""
    d: dict = {}
    chans = cfg.block_out_channels
    ch0 = chans[0]
    tdim = ch0 * 4
    ctx = cfg.cross_attention_dim
    hd = cfg.attention_head_dim
    _conv(d, "conv_in", ch0, cfg.in_channels, 3)
    _lin(d, "time_embedding.linear_1", tdim, ch0)
    _lin(d, "time_embedding.linear_2", tdim, tdim)
    add_in = (cfg.pooled_text_embed_dim
              + cfg.num_time_ids * cfg.addition_time_embed_dim)
    _lin(d, "add_embedding.linear_1", tdim, add_in)
    _lin(d, "add_embedding.linear_2", tdim, tdim)

    # down path — mirror the skip-stack bookkeeping of the model exactly
    skips = [ch0]
    h = ch0
    for i, ch in enumerate(chans):
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block):
            _resnet(d, f"down_blocks.{i}.resnets.{j}", h, ch, tdim)
            h = ch
            if depth > 0:
                _transformer(d, f"down_blocks.{i}.attentions.{j}", ch, depth,
                             ctx, hd)
            skips.append(h)
        if i < len(chans) - 1:
            _conv(d, f"down_blocks.{i}.downsamplers.0.conv", ch, ch, 3)
            skips.append(ch)

    mid_depth = cfg.transformer_layers_per_block[-1]
    _resnet(d, "mid_block.resnets.0", h, h, tdim)
    if mid_depth > 0:
        _transformer(d, "mid_block.attentions.0", h, mid_depth, ctx, hd)
    _resnet(d, "mid_block.resnets.1", h, h, tdim)

    for idx, i in enumerate(reversed(range(len(chans)))):
        ch = chans[i]
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            _resnet(d, f"up_blocks.{idx}.resnets.{j}", h + skip, ch, tdim)
            h = ch
            if depth > 0:
                _transformer(d, f"up_blocks.{idx}.attentions.{j}", ch, depth,
                             ctx, hd)
        if i > 0:
            _conv(d, f"up_blocks.{idx}.upsamplers.0.conv", ch, ch, 3)

    _norm(d, "conv_norm_out", ch0)
    _conv(d, "conv_out", cfg.out_channels, ch0, 3)
    return d


def _cross_attn_channels(cfg: SDXLUNetConfig) -> list[int]:
    """Query channels of every cross-attention in diffusers attn_processors
    enumeration order: down_blocks, up_blocks, mid_block."""
    chans = []
    n = len(cfg.block_out_channels)
    for i in range(n):
        chans += ([cfg.block_out_channels[i]]
                  * cfg.transformer_layers_per_block[i]
                  * cfg.layers_per_block)
    for i in reversed(range(n)):
        chans += ([cfg.block_out_channels[i]]
                  * cfg.transformer_layers_per_block[i]
                  * (cfg.layers_per_block + 1))
    chans += [cfg.block_out_channels[-1]] * cfg.transformer_layers_per_block[-1]
    return chans


def ip_adapter_spec(cfg: SDXLUNetConfig) -> dict:
    """ip-adapter_sdxl_vit-h checkpoint grammar: ``image_proj`` head +
    ``ip_adapter.{odd idx}.to_{k,v}_ip`` per cross-attention (the saved
    ModuleList interleaves param-free attn1 processors, leaving odd ids)."""
    d = {
        "image_proj.proj.weight": (
            cfg.ip_num_tokens * cfg.cross_attention_dim,
            cfg.ip_image_embed_dim,
        ),
        "image_proj.proj.bias": (cfg.ip_num_tokens * cfg.cross_attention_dim,),
        "image_proj.norm.weight": (cfg.cross_attention_dim,),
        "image_proj.norm.bias": (cfg.cross_attention_dim,),
    }
    for n, ch in enumerate(_cross_attn_channels(cfg)):
        inner = max(ch // cfg.attention_head_dim, 1) * cfg.attention_head_dim
        idx = 2 * n + 1
        d[f"ip_adapter.{idx}.to_k_ip.weight"] = (
            inner, cfg.cross_attention_dim)
        d[f"ip_adapter.{idx}.to_v_ip.weight"] = (
            inner, cfg.cross_attention_dim)
    return d


# ——————————— diffusers AutoencoderKL checkpoint grammar ———————————


def _vae_resnet(d, p, cin, cout):
    _norm(d, f"{p}.norm1", cin)
    _conv(d, f"{p}.conv1", cout, cin, 3)
    _norm(d, f"{p}.norm2", cout)
    _conv(d, f"{p}.conv2", cout, cout, 3)
    if cin != cout:
        _conv(d, f"{p}.conv_shortcut", cout, cin, 1)


def _vae_mid(d, pre, ch, with_attn):
    _vae_resnet(d, f"{pre}.mid_block.resnets.0", ch, ch)
    if with_attn:
        a = f"{pre}.mid_block.attentions.0"
        _norm(d, f"{a}.group_norm", ch)
        _lin(d, f"{a}.to_q", ch, ch)
        _lin(d, f"{a}.to_k", ch, ch)
        _lin(d, f"{a}.to_v", ch, ch)
        _lin(d, f"{a}.to_out.0", ch, ch)
    _vae_resnet(d, f"{pre}.mid_block.resnets.1", ch, ch)


def vae_checkpoint_spec(cfg: VAEConfig) -> dict:
    d: dict = {}
    chans = cfg.block_out_channels
    # encoder
    _conv(d, "encoder.conv_in", chans[0], cfg.in_channels, 3)
    h = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            _vae_resnet(d, f"encoder.down_blocks.{i}.resnets.{j}", h, ch)
            h = ch
        if i < len(chans) - 1:
            _conv(d, f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch, 3)
    _vae_mid(d, "encoder", chans[-1], cfg.use_mid_attention)
    _norm(d, "encoder.conv_norm_out", chans[-1])
    _conv(d, "encoder.conv_out", 2 * cfg.latent_channels, chans[-1], 3)
    # decoder
    _conv(d, "decoder.conv_in", chans[-1], cfg.latent_channels, 3)
    _vae_mid(d, "decoder", chans[-1], cfg.use_mid_attention)
    h = chans[-1]
    for i, ch in enumerate(reversed(chans)):
        for j in range(cfg.layers_per_block + 1):
            _vae_resnet(d, f"decoder.up_blocks.{i}.resnets.{j}", h, ch)
            h = ch
        if i < len(chans) - 1:
            _conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)
    _norm(d, "decoder.conv_norm_out", chans[0])
    _conv(d, "decoder.conv_out", cfg.in_channels, chans[0], 3)
    _conv(d, "quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
    _conv(d, "post_quant_conv", cfg.latent_channels, cfg.latent_channels, 1)
    return d


# ——————————— OpenCLIP checkpoint grammar (ViT-H/14) ———————————


def _openclip_block(d, p, w):
    _norm(d, f"{p}.ln_1", w)
    d[f"{p}.attn.in_proj_weight"] = (3 * w, w)
    d[f"{p}.attn.in_proj_bias"] = (3 * w,)
    _lin(d, f"{p}.attn.out_proj", w, w)
    _norm(d, f"{p}.ln_2", w)
    _lin(d, f"{p}.mlp.c_fc", 4 * w, w)
    _lin(d, f"{p}.mlp.c_proj", w, 4 * w)


def openclip_spec(vcfg: CLIPVisionConfig, tcfg: CLIPTextConfig) -> dict:
    d: dict = {"logit_scale": ()}
    grid = vcfg.image_size // vcfg.patch_size
    d["visual.conv1.weight"] = (vcfg.width, 3, vcfg.patch_size,
                                vcfg.patch_size)
    d["visual.class_embedding"] = (vcfg.width,)
    d["visual.positional_embedding"] = (grid * grid + 1, vcfg.width)
    _norm(d, "visual.ln_pre", vcfg.width)
    for i in range(vcfg.layers):
        _openclip_block(d, f"visual.transformer.resblocks.{i}", vcfg.width)
    _norm(d, "visual.ln_post", vcfg.width)
    d["visual.proj"] = (vcfg.width, vcfg.embed_dim)
    d["token_embedding.weight"] = (tcfg.vocab_size, tcfg.width)
    d["positional_embedding"] = (tcfg.context_length, tcfg.width)
    for i in range(tcfg.layers):
        _openclip_block(d, f"transformer.resblocks.{i}", tcfg.width)
    _norm(d, "ln_final", tcfg.width)
    d["text_projection"] = (tcfg.width, tcfg.embed_dim)
    return d


# ——————————— grammar cross-validation at tiny scale ———————————


def test_unet_spec_matches_independent_torch_oracle():
    """The hand enumerator must reproduce the tiny torch oracle's
    state_dict() exactly (keys AND shapes) — this is what licenses using the
    same enumerator at full size."""
    import test_sdxl_torch_parity as par

    cfg = SDXLUNetConfig.tiny()
    oracle = par.TTinySDXLUNet(cfg)
    want = {k: tuple(v.shape) for k, v in oracle.state_dict().items()
            if "_ip" not in k}
    got = unet_checkpoint_spec(cfg)
    assert got == want, (
        sorted(set(got) - set(want))[:5], sorted(set(want) - set(got))[:5],
        {k: (got[k], want[k]) for k in got if k in want and got[k] != want[k]},
    )


def test_vae_spec_matches_independent_torch_oracle():
    import test_sdxl_torch_parity as par

    cfg = VAEConfig.tiny()
    oracle = par.TTinyVAE(cfg)
    want = {k: tuple(v.shape) for k, v in oracle.state_dict().items()}
    got = vae_checkpoint_spec(cfg)
    assert got == want, (
        sorted(set(got) - set(want))[:5], sorted(set(want) - set(got))[:5])


def test_ip_adapter_spec_tiny_indices_and_count():
    cfg = SDXLUNetConfig.tiny()
    spec = ip_adapter_spec(cfg)
    idxs = sorted(int(k.split(".")[1]) for k in spec
                  if k.startswith("ip_adapter.") and k.endswith("to_k_ip.weight"))
    # tiny: down1 + up0_attn0 + up0_attn1 + mid = 4 cross-attns → odd ids
    assert idxs == [1, 3, 5, 7]


# ——————————— full-size rehearsals ———————————


def test_sdxl_turbo_unet_fullsize_conversion():
    """The real thing: 2.57B-param sdxl-turbo UNet + the 70-entry IP-Adapter
    (ids 1..139), converted with full key coverage and exact shape match
    against the flax init tree."""
    cfg = SDXLUNetConfig.sdxl_turbo()
    spec = unet_checkpoint_spec(cfg)
    ip_spec = ip_adapter_spec(cfg)
    assert len([k for k in ip_spec if k.endswith("to_k_ip.weight")]) == 70
    assert max(int(k.split(".")[1]) for k in ip_spec
               if k.startswith("ip_adapter.")) == 139

    params = convert_sdxl_unet(_synth(spec), cfg, ip_adapter_sd=_synth(ip_spec))

    # (a) full coverage: every checkpoint element landed in the tree
    assert _tree_total(params) == _total(spec) + _total(ip_spec)

    # (b) exact shape match vs the model's own init
    model = SDXLUNet(cfg, dtype=jnp.bfloat16)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 8, 8, cfg.in_channels), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16),
            jnp.zeros((1, cfg.pooled_text_embed_dim), jnp.bfloat16),
            jnp.zeros((1, cfg.num_time_ids), jnp.float32),
            jnp.zeros((1, cfg.ip_image_embed_dim), jnp.bfloat16),
        )
    )["params"]
    _assert_same_shapes(params, expected, "sdxl_turbo unet")


def test_sdxl_unet_rejects_misordered_ip_adapter():
    """An IP-Adapter file whose entries follow spatial traversal order
    (down, MID, up — the pre-fix assumption) must fail loudly at full size:
    640-dim up1 weights land on 1280-dim slots."""
    cfg = SDXLUNetConfig.sdxl_turbo()
    spec = unet_checkpoint_spec(cfg)
    chans = _cross_attn_channels(cfg)
    # rebuild the entry CHANNEL sequence in the wrong (down, mid, up) order
    n = len(cfg.block_out_channels)
    wrong = []
    for i in range(n):
        wrong += ([cfg.block_out_channels[i]]
                  * cfg.transformer_layers_per_block[i] * cfg.layers_per_block)
    wrong += [cfg.block_out_channels[-1]] * cfg.transformer_layers_per_block[-1]
    for i in reversed(range(n)):
        wrong += ([cfg.block_out_channels[i]]
                  * cfg.transformer_layers_per_block[i]
                  * (cfg.layers_per_block + 1))
    assert wrong != chans  # orders genuinely differ at SDXL scale
    ip_sd = {
        "image_proj.proj.weight": np.zeros(
            (cfg.ip_num_tokens * cfg.cross_attention_dim,
             cfg.ip_image_embed_dim), np.float16),
        "image_proj.proj.bias": np.zeros(
            (cfg.ip_num_tokens * cfg.cross_attention_dim,), np.float16),
        "image_proj.norm.weight": np.zeros(
            (cfg.cross_attention_dim,), np.float16),
        "image_proj.norm.bias": np.zeros(
            (cfg.cross_attention_dim,), np.float16),
    }
    for j, ch in enumerate(wrong):
        ip_sd[f"ip_adapter.{2 * j + 1}.to_k_ip.weight"] = np.zeros(
            (ch, cfg.cross_attention_dim), np.float16)
        ip_sd[f"ip_adapter.{2 * j + 1}.to_v_ip.weight"] = np.zeros(
            (ch, cfg.cross_attention_dim), np.float16)
    with pytest.raises(ValueError, match="enumeration-order mismatch"):
        convert_sdxl_unet(_synth(spec), cfg, ip_adapter_sd=ip_sd)


def test_sdxl_vae_fullsize_conversion():
    cfg = VAEConfig.sdxl()
    spec = vae_checkpoint_spec(cfg)
    params = convert_sdxl_vae(_synth(spec), cfg)
    assert _tree_total(params) == _total(spec)
    model = VAE(cfg, dtype=jnp.bfloat16)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
        )
    )["params"]
    _assert_same_shapes(params, expected, "sdxl vae")


def _hf_text_cfg(cfg: CLIPTextConfig, projection: bool):
    return transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.width,
        intermediate_size=4 * cfg.width,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.context_length,
        hidden_act=cfg.act,
        projection_dim=cfg.embed_dim,
    )


def test_sdxl_text_encoders_fullsize_conversion():
    """Dual towers at the real configs (CLIP-L 12 layers, bigG 32 layers) —
    grammar taken from the REAL transformers classes on the meta device."""
    cfg = SDXLTextEncoderConfig()  # sdxl_clip_l + sdxl_big_g
    with torch.device("meta"):
        te1 = transformers.CLIPTextModel(_hf_text_cfg(cfg.clip_l, False))
        te2 = transformers.CLIPTextModelWithProjection(
            _hf_text_cfg(cfg.big_g, True))
    spec1 = {k: tuple(v.shape) for k, v in te1.state_dict().items()
             if not k.endswith("position_ids")}
    spec2 = {k: tuple(v.shape) for k, v in te2.state_dict().items()
             if not k.endswith("position_ids")}
    assert "text_projection.weight" in spec2
    assert "text_projection.weight" not in spec1

    params = convert_sdxl_text_encoders(
        _synth(spec1), _synth(spec2), cfg)
    # te1 gets an injected identity projection (SDXL never uses its pooled
    # output); te2's projection comes from the checkpoint
    assert _tree_total(params["te1"]) == (
        _total(spec1) + cfg.clip_l.width * cfg.clip_l.width)
    assert _tree_total(params["te2"]) == _total(spec2)

    enc = SDXLTextEncoder(cfg)
    expected = jax.eval_shape(enc.init)
    _assert_same_shapes(params, expected, "sdxl text encoders")


def test_openclip_vit_h_fullsize_conversion():
    """OpenCLIP ViT-H/14 (laion2b) full checkpoint: 32-layer vision tower +
    24-layer text tower; the only unconsumed key must be logit_scale."""
    vcfg = CLIPVisionConfig.vit_h_14()
    tcfg = CLIPTextConfig.vit_h_14()
    spec = openclip_spec(vcfg, tcfg)
    sd = _synth(spec)
    vis = convert_openclip_vision(sd, vcfg)
    txt = convert_openclip_text(sd, tcfg)
    assert _tree_total(vis) + _tree_total(txt) == _total(spec) - 1  # logit_scale

    vision = CLIPVisionTower(vcfg)
    expected_v = jax.eval_shape(
        lambda: vision.init(
            jax.random.key(0),
            jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)),
        )
    )["params"]
    _assert_same_shapes(vis, expected_v, "openclip vit-h vision")

    text = CLIPTextTower(tcfg)
    expected_t = jax.eval_shape(
        lambda: text.init(
            jax.random.key(0),
            jnp.zeros((1, tcfg.context_length), jnp.int32),
        )
    )["params"]
    _assert_same_shapes(txt, expected_t, "openclip vit-h text")


def test_git_large_coco_fullsize_conversion():
    """git-large-coco: 6-layer decoder + ViT-L/14 grid tower, grammar from
    the real GitForCausalLM class on the meta device."""
    cfg = GITConfig.git_large_coco()
    vis_cfg = CLIPVisionConfig.git_vit_l_14()
    hf_cfg = transformers.GitConfig(
        vision_config=transformers.GitVisionConfig(
            hidden_size=vis_cfg.width,
            intermediate_size=4 * vis_cfg.width,
            num_hidden_layers=vis_cfg.layers,
            num_attention_heads=vis_cfg.heads,
            patch_size=vis_cfg.patch_size,
            image_size=vis_cfg.image_size,
        ).to_dict(),
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    with torch.device("meta"):
        git = transformers.GitForCausalLM(hf_cfg)
    full = {k: tuple(v.shape) for k, v in git.state_dict().items()
            if not k.endswith("position_ids")}
    dec_spec = {k: s for k, s in full.items()
                if not k.startswith("git.image_encoder.")}
    vis_spec = {k.removeprefix("git.image_encoder."): s
                for k, s in full.items()
                if k.startswith("git.image_encoder.")}

    params = convert_git_causal_lm(_synth(dec_spec), cfg)
    assert _tree_total(params) == _total(dec_spec)
    model = GITCaptioner(cfg)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.num_visual_tokens, cfg.visual_dim)),
            jnp.zeros((1, 2), jnp.int32),
        )
    )["params"]
    _assert_same_shapes(params, expected, "git-large-coco decoder")

    vparams = convert_hf_clip_vision(_synth(vis_spec), vis_cfg)
    # grid consumer: identity proj injected (width², not in the checkpoint)
    assert _tree_total(vparams) == (
        _total(vis_spec) + vis_cfg.width * vis_cfg.width)
    tower = CLIPVisionTower(vis_cfg)
    expected_v = jax.eval_shape(
        lambda: tower.init(
            jax.random.key(0),
            jnp.zeros((1, vis_cfg.image_size, vis_cfg.image_size, 3)),
        )
    )["params"]
    _assert_same_shapes(vparams, expected_v, "git vision tower")


def test_diffusion_prior_fullsize_conversion():
    """The reference's trained ``diffusion_prior.pt`` at its real dims
    (hidden (1024,512,256,128,64), ref ``diffusion_prior.py:92-203``)."""
    import test_prior_convert as pc

    from eeg_image_decode_tpu.models.diffusion_prior import (
        DiffusionPriorUNet,
        convert_diffusion_prior,
    )

    dims = (1024, 512, 256, 128, 64)
    ref = pc._RefPriorUNet(embed_dim=1024, cond_dim=1024, hidden_dim=dims,
                           time_embed_dim=512)
    spec = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    params = convert_diffusion_prior(_synth(spec))
    assert _tree_total(params) == _total(spec)
    model = DiffusionPriorUNet(embed_dim=1024, cond_dim=1024,
                               hidden_dims=dims, time_embed_dim=512)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 1024)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1024)),
        )
    )["params"]
    _assert_same_shapes(params, expected, "diffusion prior full dims")
