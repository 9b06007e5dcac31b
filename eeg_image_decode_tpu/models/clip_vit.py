"""CLIP image/text towers in flax — the external model hub, made native.

The reference leans on OpenCLIP ViT-H/14 (laion2b) as a frozen feature
extractor loaded at *module import* (``Retrieval/eegdatasets_leaveone.py:
18-21``) and on CLIP ViT-L/14 grid features for GIT. Those are torch/CUDA
dependencies; here both towers are config-driven flax modules with shapes
matching the OpenCLIP checkpoints (``vit_h_14()`` / ``vit_l_14()``), so
converted weights give TPU-side feature extraction and the whole framework
runs without torch at inference.

Standard CLIP architecture (Radford et al. 2021): pre-norm ViT with class
token + learned positions and a final projection; byte-BPE text transformer
with causal mask, features taken at the EOT token.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    embed_dim: int = 1024  # output projection width
    #: "gelu" (OpenCLIP laion checkpoints, e.g. ViT-H/14) or "quick_gelu"
    #: (OpenAI CLIP checkpoints, e.g. the ViT-L/14 grid tower GIT uses)
    act: str = "gelu"

    @staticmethod
    def vit_h_14() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def vit_l_14() -> "CLIPVisionConfig":
        return CLIPVisionConfig(width=1024, layers=24, heads=16,
                                embed_dim=768, act="quick_gelu")

    @staticmethod
    def git_vit_l_14() -> "CLIPVisionConfig":
        """GIT's ``git.image_encoder`` (CLIPVisionModel, no projection head):
        the grid consumer never uses ``proj``, so embed_dim == width and the
        converter fills an identity."""
        return CLIPVisionConfig(width=1024, layers=24, heads=16,
                                embed_dim=1024, act="quick_gelu")

    @staticmethod
    def tiny(act: str = "gelu") -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, width=64,
                                layers=2, heads=2, embed_dim=32, act=act)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 1024
    #: "quick_gelu" (OpenAI CLIP family) or "gelu" (OpenCLIP bigG family)
    act: str = "quick_gelu"

    @staticmethod
    def vit_h_14() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sdxl_clip_l() -> "CLIPTextConfig":
        """SDXL ``text_encoder`` (OpenAI CLIP ViT-L/14 text tower)."""
        return CLIPTextConfig(width=768, layers=12, heads=12, embed_dim=768,
                              act="quick_gelu")

    @staticmethod
    def sdxl_big_g() -> "CLIPTextConfig":
        """SDXL ``text_encoder_2`` (OpenCLIP ViT-bigG/14 text tower)."""
        return CLIPTextConfig(width=1280, layers=32, heads=20, embed_dim=1280,
                              act="gelu")

    @staticmethod
    def tiny(act: str = "quick_gelu") -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=64, context_length=12, width=32,
                              layers=2, heads=2, embed_dim=32, act=act)


class _ResidualAttnBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn",
        )(h, h, mask=mask)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        if self.act == "quick_gelu":  # CLIP's original activation
            h = h * jax.nn.sigmoid(1.702 * h)
        else:  # exact gelu (OpenCLIP bigG)
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images: jax.Array, *, return_grid: bool = False
    ) -> jax.Array:
        """(B, H, W, 3) normalized images → (B, embed_dim) features, or the
        (B, 1+grid², width) token grid when ``return_grid`` (GIT's input)."""
        cfg = self.config
        B = images.shape[0]
        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, -1, cfg.width)
        n_tokens = x.shape[1] + 1
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.width)), x], 1
        )
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (n_tokens, cfg.width))
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        for i in range(cfg.layers):
            x = _ResidualAttnBlock(cfg.width, cfg.heads, dtype=self.dtype,
                                   act=cfg.act, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
        if return_grid:
            return x
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.embed_dim))
        return (x[:, 0] @ proj).astype(jnp.float32)


class CLIPTextTower(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, token_ids: jax.Array, *, return_states: bool = False
    ):
        """(B, L) BPE ids (EOT = max id in each row) → (B, embed_dim).

        With ``return_states`` the full conditioning bundle comes back as a
        dict — SDXL consumes the PENULTIMATE hidden state (the input to the
        last block, before the final LayerNorm — transformers'
        ``hidden_states[-2]``; diffusers ``encode_prompt``) plus the projected
        EOT feature as the pooled embedding.
        """
        cfg = self.config
        B, L = token_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")(
            token_ids
        ).astype(self.dtype)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (cfg.context_length, cfg.width))
        x = x + pos[:L].astype(self.dtype)[None]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        penultimate = x
        for i in range(cfg.layers):
            if i == cfg.layers - 1:
                penultimate = x
            x = _ResidualAttnBlock(cfg.width, cfg.heads, dtype=self.dtype,
                                   act=cfg.act, name=f"block_{i}")(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        # features at the EOT token (highest id per row, CLIP convention;
        # also correct under eos- or 0-padding since EOT stays the row max)
        eot = jnp.argmax(token_ids, axis=-1)
        feats = x[jnp.arange(B), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (cfg.width, cfg.embed_dim))
        pooled = (feats @ proj).astype(jnp.float32)
        if not return_states:
            return pooled
        return {
            "pooled": pooled,
            "penultimate": penultimate.astype(jnp.float32),
            "final": x.astype(jnp.float32),
        }


def encode_images_jax(
    tower: CLIPVisionTower, params, images: jax.Array, *, normalize: bool = True
) -> jax.Array:
    feats = tower.apply({"params": params}, images)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def clip_preprocess(images: jax.Array) -> jax.Array:
    """[0,1] RGB → CLIP normalization (OpenCLIP mean/std)."""
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
    return (images - mean) / std
