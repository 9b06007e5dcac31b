"""NICE baseline encoder: tsconv trunk + projector, no attention.

Rebuilds ``Retrieval/contrast_retrieval.py:37-117`` — the ShallowNet-derived
PatchEmbedding + FlattenHead + Proj_eeg stack applied directly to the raw
(B, 63, 250) EEG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.layers import ProjectionHead, TSConv


class NICE(nn.Module):
    n_channels: int = 63
    emb_size: int = 40
    proj_dim: int = 1024
    temporal_kernel: int = 25
    pool_size: int = 51
    pool_stride: int = 5
    fused_tsconv: bool | str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del subject_ids  # NICE is subject-agnostic (ref :105-117)
        tokens = TSConv(
            emb_size=self.emb_size,
            spatial_extent=self.n_channels,
            temporal_kernel=self.temporal_kernel,
            pool_size=self.pool_size,
            pool_stride=self.pool_stride,
            fused_stage1=self.fused_tsconv,
            dtype=self.dtype,
            name="enc_eeg",
        )(x, deterministic=deterministic)
        return ProjectionHead(
            proj_dim=self.proj_dim, dtype=self.dtype, name="proj_eeg"
        )(tokens, deterministic=deterministic)
