"""SDXL's dual CLIP text-conditioning stack, TPU-native.

The reference conditions SDXL-turbo on ``encode_prompt('')`` — a NON-zero
embedding — through two CLIP text towers inside diffusers
(``Generation/custom_pipeline.py:239-254``), and the semantic recombination
notebook feeds real caption prompts (``1x1024_reconstruct_sdxl.ipynb``).
This module rebuilds that stack natively:

- tower 1: OpenAI CLIP ViT-L/14 text model (``text_encoder``),
- tower 2: OpenCLIP ViT-bigG/14 text model with projection
  (``text_encoder_2``),
- context = concat of the two PENULTIMATE hidden states → (B, 77, 2048),
- pooled  = tower 2's projected EOT feature → (B, 1280),

exactly diffusers' ``StableDiffusionXLPipeline.encode_prompt`` semantics
(``clip_skip=None`` ⇒ ``hidden_states[-2]``, no final LayerNorm). Both
towers run in one jit; weights convert from the transformers checkpoints via
:func:`convert_hf_clip_text`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.models.clip_vit import CLIPTextConfig, CLIPTextTower


@dataclass(frozen=True)
class SDXLTextEncoderConfig:
    clip_l: CLIPTextConfig = field(default_factory=CLIPTextConfig.sdxl_clip_l)
    big_g: CLIPTextConfig = field(default_factory=CLIPTextConfig.sdxl_big_g)

    @property
    def context_dim(self) -> int:
        return self.clip_l.width + self.big_g.width

    @property
    def pooled_dim(self) -> int:
        return self.big_g.embed_dim

    @staticmethod
    def tiny() -> "SDXLTextEncoderConfig":
        return SDXLTextEncoderConfig(
            clip_l=CLIPTextConfig.tiny(act="quick_gelu"),
            big_g=CLIPTextConfig.tiny(act="gelu"),
        )


class SDXLTextEncoder:
    """encode(prompts) → (context (B, L, 2048), pooled (B, 1280))."""

    def __init__(self, config: SDXLTextEncoderConfig = SDXLTextEncoderConfig(),
                 *, dtype=jnp.float32):
        self.config = config
        self.tower1 = CLIPTextTower(config.clip_l, dtype=dtype)
        self.tower2 = CLIPTextTower(config.big_g, dtype=dtype)

    def init(self, key: jax.Array | None = None) -> dict:
        key = key if key is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        L1 = self.config.clip_l.context_length
        L2 = self.config.big_g.context_length
        return {
            "te1": self.tower1.init(k1, jnp.zeros((1, L1), jnp.int32))["params"],
            "te2": self.tower2.init(k2, jnp.zeros((1, L2), jnp.int32))["params"],
        }

    @partial(jax.jit, static_argnums=0)
    def encode_tokens(self, params: dict, ids1: jax.Array, ids2: jax.Array
                      ) -> tuple[jax.Array, jax.Array]:
        """(B, L) token ids per tokenizer → (context, pooled)."""
        out1 = self.tower1.apply({"params": params["te1"]}, ids1,
                                 return_states=True)
        out2 = self.tower2.apply({"params": params["te2"]}, ids2,
                                 return_states=True)
        context = jnp.concatenate(
            [out1["penultimate"], out2["penultimate"]], axis=-1
        )
        return context, out2["pooled"]

    def encode(self, params: dict, prompts: list[str], tokenizer1, tokenizer2
               ) -> tuple[jax.Array, jax.Array]:
        """Host-side convenience: tokenize with both tokenizers + encode.

        ``tokenizer1`` pads with ``<|endoftext|>``, ``tokenizer2`` with ``!``
        (the SDXL checkpoint convention); construct them via
        ``CLIPBPETokenizer.from_files(..., pad_token="!")`` accordingly.
        """
        ids1 = jnp.asarray(tokenizer1(prompts))
        ids2 = jnp.asarray(tokenizer2(prompts))
        return self.encode_tokens(params, ids1, ids2)


def tiny_text_encoder_config(unet_cfg, tokenizer_dir: str
                             ) -> SDXLTextEncoderConfig:
    """Tiny dual-tower config matched to a tiny UNet: the two tower widths
    sum to ``cross_attention_dim``, tower-2's projection emits
    ``pooled_text_embed_dim``, and the vocab size comes from the tokenizer's
    ``vocab.json``. Used by the CLI's ``--tiny`` smoke path so the text
    conditioning plugs into ``SDXLUNetConfig.tiny()``."""
    import json
    import os

    with open(os.path.join(tokenizer_dir, "vocab.json")) as f:
        vocab_size = len(json.load(f))
    xd = unet_cfg.cross_attention_dim
    w1 = xd // 2
    return SDXLTextEncoderConfig(
        clip_l=CLIPTextConfig(
            vocab_size=vocab_size, context_length=12, width=w1, layers=2,
            heads=2, embed_dim=w1, act="quick_gelu",
        ),
        big_g=CLIPTextConfig(
            vocab_size=vocab_size, context_length=12, width=xd - w1, layers=2,
            heads=2, embed_dim=unet_cfg.pooled_text_embed_dim, act="gelu",
        ),
    )


# ——————————————————— transformers checkpoint conversion ———————————————————


def _hf_ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _hf_linear(sd, p):
    return {"kernel": np.asarray(sd[f"{p}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _hf_attn(sd, prefix, width, heads):
    head_dim = width // heads

    def fold(p):
        w = np.asarray(sd[f"{prefix}.{p}_proj.weight"], np.float32)
        b = np.asarray(sd[f"{prefix}.{p}_proj.bias"], np.float32)
        return {
            "kernel": np.ascontiguousarray(w.T.reshape(width, heads, head_dim)),
            "bias": b.reshape(heads, head_dim),
        }

    w_out = np.asarray(sd[f"{prefix}.out_proj.weight"], np.float32)
    return {
        "query": fold("q"),
        "key": fold("k"),
        "value": fold("v"),
        "out": {
            "kernel": np.ascontiguousarray(
                w_out.T.reshape(heads, head_dim, width)
            ),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"], np.float32),
        },
    }


def convert_hf_clip_text(sd: dict, cfg: CLIPTextConfig) -> dict:
    """transformers ``CLIPTextModel(WithProjection)`` state_dict → flax
    :class:`CLIPTextTower` params.

    ``text_projection.weight`` is present only on the WithProjection variant
    (SDXL's ``text_encoder_2``); the plain model (``text_encoder``) gets an
    identity projection — SDXL never consumes tower 1's pooled output.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    t = "text_model"
    params = {
        "token_embedding": {
            "embedding": np.asarray(
                sd[f"{t}.embeddings.token_embedding.weight"], np.float32
            )
        },
        "positional_embedding": np.asarray(
            sd[f"{t}.embeddings.position_embedding.weight"], np.float32
        ),
        "ln_final": _hf_ln(sd, f"{t}.final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        params["text_projection"] = np.asarray(
            sd["text_projection.weight"], np.float32
        ).T
    else:
        assert cfg.width == cfg.embed_dim, (
            "projection-free checkpoint needs width == embed_dim"
        )
        params["text_projection"] = np.eye(cfg.width, dtype=np.float32)
    for i in range(cfg.layers):
        p = f"{t}.encoder.layers.{i}"
        params[f"block_{i}"] = {
            "ln_1": _hf_ln(sd, f"{p}.layer_norm1"),
            "attn": _hf_attn(sd, f"{p}.self_attn", cfg.width, cfg.heads),
            "ln_2": _hf_ln(sd, f"{p}.layer_norm2"),
            "mlp_fc": _hf_linear(sd, f"{p}.mlp.fc1"),
            "mlp_proj": _hf_linear(sd, f"{p}.mlp.fc2"),
        }
    return params


def convert_sdxl_text_encoders(
    sd1: dict, sd2: dict, config: SDXLTextEncoderConfig = SDXLTextEncoderConfig()
) -> dict:
    """(text_encoder, text_encoder_2) state_dicts → SDXLTextEncoder params."""
    return {
        "te1": convert_hf_clip_text(sd1, config.clip_l),
        "te2": convert_hf_clip_text(sd2, config.big_g),
    }
