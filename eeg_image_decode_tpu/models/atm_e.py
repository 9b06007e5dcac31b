"""ATM-E: time-token attention variant of the ATM encoder.

Rebuilds ``Retrieval/ATME_retrieval.py:29-148``: a 1-layer torch-style
transformer over **time steps** (d_model = 63 channels, 1 head, post-norm,
ReLU FFN of width 2048) + positional encoding, a subject-wise
Linear(250→250) on the time axis, then EEGNetV4 as the "tsconv" producing a
1440-d embedding, and the shared projector to 1024.

(The reference script has dead imports and is unrunnable as-is — treated as
an architecture spec, per SURVEY.md C20.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.eegnetv4 import EEGNetV4
from eeg_image_decode_tpu.models.layers import (
    ProjectionHead,
    sinusoidal_position_embedding,
)


class TimeAxisAttention(nn.Module):
    """One post-norm transformer layer over time tokens (torch
    ``nn.TransformerEncoderLayer`` defaults: relu FFN 2048, dropout 0.1)."""

    d_model: int = 63
    n_heads: int = 1
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        # x: (B, T, C=d_model)
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attn",
        )(x, x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        )
        y = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn_in")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")(y)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(y)
        )


class ATME(nn.Module):
    n_channels: int = 63
    seq_len: int = 250
    emb_dim: int = 1440
    proj_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del subject_ids  # the reference always uses subject_wise_linear[0]
        # (B, C, T) → time tokens (B, T, C) + positional code over time
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)
        pe = sinusoidal_position_embedding(self.seq_len, self.n_channels)
        h = h + jnp.asarray(pe, self.dtype)[None]
        h = TimeAxisAttention(
            d_model=self.n_channels, dtype=self.dtype, name="attention"
        )(h, deterministic=deterministic)
        # back to (B, C, T), subject-wise linear on the time axis
        h = jnp.swapaxes(h, 1, 2)
        h = nn.Dense(self.seq_len, dtype=self.dtype, name="subject_linear")(h)
        feats = EEGNetV4(
            n_channels=self.n_channels,
            n_times=self.seq_len,
            out_dim=self.emb_dim,
            dtype=self.dtype,
            name="enc_eeg",
        )(h, deterministic=deterministic)
        return ProjectionHead(
            proj_dim=self.proj_dim, dtype=self.dtype, name="proj_eeg"
        )(feats, deterministic=deterministic)
