"""ATM-S: the flagship EEG encoder (Adaptive Thinking Mapper, spatial).

Rebuilds ``Retrieval/ATMS_retrieval.py:44-191`` (identical copy at
``Generation/ATMS_reconstruction.py:44-183``) as one flax module:

    (B, 63, 250) EEG
      → ChannelTokenEmbedding: per-channel Dense(250→250) token + sinusoidal
        positions + subject token prepended                (Embed.py:124-162)
      → 1 post-norm attention layer over the 64 channel tokens, 4 heads,
        head dim 62, conv-1x1 FFN d_ff=256    (Transformer_EncDec.py:27-51,
                                               SelfAttention_Family.py:48-75,179-214)
      → final LayerNorm, keep the first 63 tokens          (ATMS_retrieval.py:91)
      → TSConv (ShallowNet-style temporal→spatial conv)    (ATMS_retrieval.py:97-125)
      → flatten (1440) → ProjectionHead → (B, 1024)        (ATMS_retrieval.py:157-167)

plus the trainable raw logit scale (init ln(1/0.07), never exponentiated —
``ATMS_retrieval.py:179,227``).

TPU notes: attention over 64 tokens × 250 dims is one small fused kernel —
see ``ops/attention.py`` for the Pallas version used when
``use_pallas=True``; the default path is plain jnp einsum which XLA already
fuses well at this size. All matmuls run in ``dtype`` (bf16 by default in
training) with fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.core.config import ATMSConfig
from eeg_image_decode_tpu.models.layers import ProjectionHead, TSConv
from eeg_image_decode_tpu.models.subject_embed import ChannelTokenEmbedding


class ChannelAttentionLayer(nn.Module):
    """Post-norm transformer encoder layer (ref ``Transformer_EncDec.py:27-51``).

    Faithful quirks: head dim = d_model // n_heads (250//4 = 62, so the QKV
    projections are 250→248), softmax scale 1/sqrt(62), FFN implemented as two
    1x1 convs (≡ Dense) with dropout after both attention and each FFN half.
    """

    d_model: int = 250
    n_heads: int = 4
    d_ff: int = 256
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        head_dim = self.d_model // self.n_heads
        inner = head_dim * self.n_heads
        B, L, _ = x.shape

        q = nn.Dense(inner, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(inner, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(inner, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, L, self.n_heads, head_dim)
        k = k.reshape(B, L, self.n_heads, head_dim)
        v = v.reshape(B, L, self.n_heads, head_dim)

        scores = jnp.einsum(
            "blhe,bshe->bhls", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / jnp.sqrt(jnp.float32(head_dim)))
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum(
            "bhls,bshd->blhd", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.reshape(B, L, inner)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)

        # post-norm residual (ref :45-51)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(out)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn_in")(x)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(
            nn.gelu(y, approximate=False)
        )
        y = nn.Dropout(self.dropout, deterministic=deterministic)(
            nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")(y)
        )
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y)


class ATMS(nn.Module):
    """ATM-S encoder → (B, proj_dim) CLIP-space features."""

    config: ATMSConfig = ATMSConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        h = ChannelTokenEmbedding(
            seq_len=cfg.seq_len,
            d_model=cfg.d_model,
            num_subjects=cfg.num_subjects,
            dropout=cfg.dropout,
            joint_train=cfg.joint_train,
            dtype=self.dtype,
            name="embedding",
        )(x, subject_ids, deterministic=deterministic)

        for i in range(cfg.n_layers):
            h = ChannelAttentionLayer(
                d_model=cfg.d_model,
                n_heads=cfg.n_heads,
                d_ff=cfg.d_ff,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"encoder_layer_{i}",
            )(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="encoder_norm")(h)

        # keep the first n_channels tokens — with the subject token prepended
        # this keeps [subject, ch_0..ch_61] and drops the last electrode,
        # exactly as the reference does (``ATMS_retrieval.py:91``).
        h = h[:, : cfg.n_channels, :]

        tokens = TSConv(
            filters=cfg.conv_filters,
            temporal_kernel=cfg.temporal_kernel,
            pool_size=cfg.pool_size,
            pool_stride=cfg.pool_stride,
            emb_size=cfg.emb_size,
            dropout=cfg.conv_dropout,
            spatial_extent=cfg.n_channels,
            dtype=self.dtype,
            name="enc_eeg",
        )(h, deterministic=deterministic)

        return ProjectionHead(
            proj_dim=cfg.proj_dim,
            dropout=cfg.proj_dropout,
            dtype=self.dtype,
            name="proj_eeg",
        )(tokens, deterministic=deterministic)

