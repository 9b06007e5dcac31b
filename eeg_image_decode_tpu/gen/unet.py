"""SDXL-style conditional UNet with IP-Adapter image-embedding cross-attention.

Rebuilds the compute graph the reference drives through diffusers
(``Generation/custom_pipeline.py:354-408`` — SDXL-turbo UNet with an
IP-Adapter that injects a 1024-d CLIP image embedding as extra cross-attention
key/values; the reference monkey-patches the pipeline to feed the embedding
directly, ``custom_pipeline.py:319-324``). Architecture follows the published
SDXL UNet layout (Podell et al. 2023): three resolution stages, no attention
at the top stage, transformer_depth (1, 2, 10), dual text conditioning via
``added_cond`` (pooled text embed + 6 fourier-embedded time_ids), ε-prediction.

Everything is config-driven so tests instantiate a tiny variant; the full
``sdxl_turbo()`` config matches the real checkpoint's shapes so converted
safetensors weights drop in (see ``gen/convert.py``).

TPU notes: NHWC layout throughout (MXU-friendly convs), attention as batched
einsums in bf16 with fp32 softmax, GroupNorm in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.diffusion_prior import timestep_embedding


@dataclass(frozen=True)
class SDXLUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: tuple[int, ...] = (0, 2, 10)  # 0 → no attn
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    #: pooled text-embed width for the added-cond path (SDXL: 1280)
    pooled_text_embed_dim: int = 1280
    #: number of micro-conditioning time_ids (SDXL: 6)
    num_time_ids: int = 6
    norm_groups: int = 32
    #: IP-Adapter: CLIP image embedding width → n tokens in cross-attn space
    ip_image_embed_dim: int = 1024
    ip_num_tokens: int = 4
    ip_scale: float = 1.0

    @staticmethod
    def sdxl_turbo() -> "SDXLUNetConfig":
        return SDXLUNetConfig()

    @staticmethod
    def tiny() -> "SDXLUNetConfig":
        return SDXLUNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            transformer_layers_per_block=(0, 1),
            attention_head_dim=16,
            cross_attention_dim=64,
            addition_time_embed_dim=32,
            pooled_text_embed_dim=64,
            norm_groups=8,
            ip_image_embed_dim=64,
            ip_num_tokens=2,
        )


class CrossAttention(nn.Module):
    """Multi-head attention; when ``ip_tokens`` is given, runs the IP-Adapter
    decomposition: out = attn(Q, K_txt, V_txt) + scale·attn(Q, K_ip, V_ip)
    with separate learned K/V projections for the image tokens."""

    query_dim: int
    context_dim: int | None = None
    head_dim: int = 64
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, N, C)
        context: jax.Array | None = None,
        ip_tokens: jax.Array | None = None,
    ) -> jax.Array:
        ctx = x if context is None else context
        n_heads = max(self.query_dim // self.head_dim, 1)
        inner = n_heads * self.head_dim

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        def attend(ctx_tokens, prefix):
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}to_k")(ctx_tokens)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}to_v")(ctx_tokens)
            B, N, _ = q.shape
            S = k.shape[1]
            qh = q.reshape(B, N, n_heads, self.head_dim)
            kh = k.reshape(B, S, n_heads, self.head_dim)
            vh = v.reshape(B, S, n_heads, self.head_dim)
            scores = jnp.einsum(
                "bnhd,bshd->bhns", qh, kh, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(self.head_dim))
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhns,bshd->bnhd", probs, vh, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            return out.reshape(B, N, inner)

        out = attend(ctx, "")
        if ip_tokens is not None:
            out = out + self.ip_scale * attend(ip_tokens, "ip_")
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="proj_in")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(
            a * nn.gelu(b, approximate=False)
        )


class TransformerBlock(nn.Module):
    dim: int
    context_dim: int
    head_dim: int
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_tokens):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(self.dim, None, self.head_dim,
                               dtype=self.dtype, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.context_dim, self.head_dim,
            ip_scale=self.ip_scale, dtype=self.dtype, name="attn2",
        )(h, context, ip_tokens)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        return x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class SpatialTransformer(nn.Module):
    channels: int
    n_layers: int
    context_dim: int
    head_dim: int
    norm_groups: int
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_tokens):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        res = x
        # diffusers Transformer2DModel GroupNorm uses eps 1e-6
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="norm")(x)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.channels)
        for i in range(self.n_layers):
            h = TransformerBlock(
                self.channels, self.context_dim, self.head_dim,
                ip_scale=self.ip_scale, dtype=self.dtype,
                name=f"block_{i}",
            )(h, context, ip_tokens)
        h = h.reshape(B, H, W, self.channels)
        return res + nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        temb = nn.Dense(self.out_channels, dtype=self.dtype,
                        name="time_emb_proj")(nn.silu(t_emb))
        h = h + temb[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class SDXLUNet(nn.Module):
    """ε-prediction UNet. Inputs:
    - latents (B, H, W, in_channels) NHWC
    - t (B,) int timesteps
    - encoder_hidden_states (B, S, cross_attention_dim) — text tokens
      (zeros for the reference's '' prompt flow)
    - added_cond: pooled text embed (B, pooled_dim) + time_ids (B, 6)
    - image_embeds (B, ip_image_embed_dim) — the IP-Adapter conditioning
      (EEG-predicted CLIP embedding); optional.
    """

    config: SDXLUNetConfig = field(default_factory=SDXLUNetConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,
        t: jax.Array,
        encoder_hidden_states: jax.Array,
        pooled_text_embed: jax.Array | None = None,
        time_ids: jax.Array | None = None,
        image_embeds: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        t_dim = ch0 * 4
        B = latents.shape[0]

        # time embedding (SDXL: flip_sin_to_cos=True, shift=0)
        t_emb = timestep_embedding(t, ch0)
        t_emb = nn.Dense(t_dim, dtype=self.dtype, name="time_embed_1")(t_emb)
        t_emb = nn.Dense(t_dim, dtype=self.dtype, name="time_embed_2")(
            nn.silu(t_emb)
        )

        # added conditioning: pooled text embed + fourier(time_ids)
        if pooled_text_embed is None:
            pooled_text_embed = jnp.zeros(
                (B, cfg.pooled_text_embed_dim), self.dtype
            )
        if time_ids is None:
            time_ids = jnp.zeros((B, cfg.num_time_ids), jnp.float32)
        ids_emb = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(B, cfg.num_time_ids * cfg.addition_time_embed_dim)
        add = jnp.concatenate(
            [pooled_text_embed.astype(jnp.float32), ids_emb], axis=-1
        )
        add = nn.Dense(t_dim, dtype=self.dtype, name="add_embed_1")(add)
        add = nn.Dense(t_dim, dtype=self.dtype, name="add_embed_2")(nn.silu(add))
        t_emb = t_emb + add

        # IP-Adapter image projection → extra context tokens
        ip_tokens = None
        if image_embeds is not None:
            ip = nn.Dense(
                cfg.ip_num_tokens * cfg.cross_attention_dim,
                dtype=self.dtype,
                name="ip_image_proj",
            )(image_embeds.astype(self.dtype))
            ip = ip.reshape(B, cfg.ip_num_tokens, cfg.cross_attention_dim)
            ip_tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ip_norm")(ip).astype(
                self.dtype
            )

        ctx = encoder_hidden_states.astype(self.dtype)
        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            latents.astype(self.dtype)
        )

        def stage(i):
            return dict(
                channels=cfg.block_out_channels[i],
                depth=cfg.transformer_layers_per_block[i],
            )

        skips = [h]
        # down
        for i in range(len(cfg.block_out_channels)):
            st = stage(i)
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(st["channels"], cfg.norm_groups,
                                dtype=self.dtype, name=f"down_{i}_res_{j}")(h, t_emb)
                if st["depth"] > 0:
                    h = SpatialTransformer(
                        st["channels"], st["depth"], cfg.cross_attention_dim,
                        cfg.attention_head_dim, cfg.norm_groups,
                        ip_scale=cfg.ip_scale, dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, ctx, ip_tokens)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(st["channels"], (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        mid = stage(len(cfg.block_out_channels) - 1)
        h = ResnetBlock(mid["channels"], cfg.norm_groups, dtype=self.dtype,
                        name="mid_res_0")(h, t_emb)
        if mid["depth"] > 0:
            h = SpatialTransformer(
                mid["channels"], mid["depth"], cfg.cross_attention_dim,
                cfg.attention_head_dim, cfg.norm_groups,
                ip_scale=cfg.ip_scale, dtype=self.dtype, name="mid_attn",
            )(h, ctx, ip_tokens)
        h = ResnetBlock(mid["channels"], cfg.norm_groups, dtype=self.dtype,
                        name="mid_res_1")(h, t_emb)

        # up (one extra resnet per stage consumes the skip stack)
        for idx, i in enumerate(reversed(range(len(cfg.block_out_channels)))):
            st = stage(i)
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(st["channels"], cfg.norm_groups,
                                dtype=self.dtype, name=f"up_{idx}_res_{j}")(h, t_emb)
                if st["depth"] > 0:
                    h = SpatialTransformer(
                        st["channels"], st["depth"], cfg.cross_attention_dim,
                        cfg.attention_head_dim, cfg.norm_groups,
                        ip_scale=cfg.ip_scale, dtype=self.dtype,
                        name=f"up_{idx}_attn_{j}",
                    )(h, ctx, ip_tokens)
            if i > 0:
                B_, H_, W_, C_ = h.shape
                h = jax.image.resize(h, (B_, H_ * 2, W_ * 2, C_), "nearest")
                h = nn.Conv(C_, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{idx}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)
