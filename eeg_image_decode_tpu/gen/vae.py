"""SDXL-style VAE (encoder + decoder) in flax, NHWC.

The reference uses the frozen diffusers SDXL VAE in three places: decoding
generated latents to pixels (``custom_pipeline.py:413-434``), encoding
low-level init images for img2img (``custom_pipeline_low_level.py``), and
producing the cached (4, 64, 64) latent targets of the low-level pipeline
(``Generation/train_vae_latent_512_low_level_no_average.py:309-323``).

Architecture follows the published AutoencoderKL layout; config-driven so
tests run a tiny variant while ``sdxl()`` matches the real checkpoint shapes
for weight conversion. Latents are scaled by ``scaling_factor`` (SDXL:
0.13025) like diffusers does.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.13025
    use_mid_attention: bool = True

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32), layers_per_block=1, norm_groups=4,
            use_mid_attention=False,
        )


class _ResBlock(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.norm_groups, dtype=jnp.float32,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.norm_groups, dtype=jnp.float32,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class _MidAttention(nn.Module):
    channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.norm_groups, dtype=jnp.float32,
                         name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        scores = jnp.einsum("bnc,bsc->bns", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / jnp.sqrt(jnp.float32(C)), axis=-1)
        out = jnp.einsum("bns,bsc->bnc", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class VAEEncoder(nn.Module):
    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1, 1] → latent distribution mean (B, h, w, 4·2)
        (mean ‖ logvar, like AutoencoderKL's moments)."""
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(images.astype(self.dtype))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype,
                              name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D: F.pad (0,1,0,1) + pad-0 stride-2 conv
                h = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                            dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_res_0")(h)
        if cfg.use_mid_attention:
            h = _MidAttention(ch, cfg.norm_groups, dtype=self.dtype,
                              name="mid_attn")(h)
        h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, dtype=jnp.float32,
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class VAEDecoder(nn.Module):
    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: jax.Array) -> jax.Array:
        """(B, h, w, 4) scaled latents → (B, H, W, 3) in [-1, 1]."""
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            latents.astype(self.dtype)
        )
        h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_res_0")(h)
        if cfg.use_mid_attention:
            h = _MidAttention(ch, cfg.norm_groups, dtype=self.dtype,
                              name="mid_attn")(h)
        h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = _ResBlock(ch, cfg.norm_groups, dtype=self.dtype,
                              name=f"up_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, dtype=jnp.float32,
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class VAE(nn.Module):
    """encode/decode pair with diffusers' latent scaling convention."""

    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.config, dtype=self.dtype)
        self.decoder = VAEDecoder(self.config, dtype=self.dtype)
        # AutoencoderKL's 1×1 moment/latent projections
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode(self, images: jax.Array, key: jax.Array | None = None):
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * (
                jax.random.normal(key, mean.shape)
            )
        return mean * self.config.scaling_factor

    def decode(self, latents: jax.Array) -> jax.Array:
        return self.decoder(
            self.post_quant_conv(latents / self.config.scaling_factor)
        )

    def __call__(self, images: jax.Array) -> jax.Array:
        return self.decode(self.encode(images))
