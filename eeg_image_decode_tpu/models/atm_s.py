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


class _DenseParams(nn.Module):
    """Raw kernel/bias pair at the same tree path nn.Dense would use — so the
    fused-kernel and XLA paths share one checkpoint layout."""

    d_in: int
    d_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.d_out))
        b = self.param("bias", nn.initializers.zeros, (self.d_out,))
        return k, b


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class ChannelAttentionLayer(nn.Module):
    """Post-norm transformer encoder layer (ref ``Transformer_EncDec.py:27-51``).

    Faithful quirks: head dim = d_model // n_heads (250//4 = 62, so the QKV
    projections are 250→248), softmax scale 1/sqrt(62), FFN implemented as two
    1x1 convs (≡ Dense) with dropout after both attention and each FFN half.

    When dropout is inactive (eval, or dropout=0 training) on TPU the whole
    layer runs as one fused Pallas kernel (``ops/attention.py``, measured
    2.6× the XLA layer time); the dropout path uses the identical math in XLA.
    """

    d_model: int = 250
    n_heads: int = 4
    d_ff: int = 256
    dropout: float = 0.25
    fused: bool | str = "auto"
    #: exact-erf FFN GELU (reference semantics for converted checkpoints);
    #: incompatible with the fused kernel — forces the XLA path
    exact_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    def _use_fused(self) -> bool:
        if self.exact_gelu:
            return False
        if self.fused == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.fused)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool,
        dropout_masks: dict | None = None,
    ) -> jax.Array:
        """``dropout_masks``: optional externally drawn pre-scaled keep-masks
        for the layer's four dropout sites — ``m_attn`` (B,H,L,L) on the
        softmax probs (ref ``SelfAttention_Family.py:69``), ``m_res`` (B,L,D)
        on the attention output before the residual add
        (``Transformer_EncDec.py:45``), ``m_ffn1`` (B,L,FF) after the FFN
        activation (``:48``) and ``m_ffn2`` (B,L,D) after the second FFN conv
        (``:49``). Same dict convention as
        ``ops.attention.attention_layer_reference``. When given, the layer
        runs the XLA path with those exact masks — the dropout-placement
        parity hook."""
        from eeg_image_decode_tpu.ops.attention import fused_attention_layer

        head_dim = self.d_model // self.n_heads
        inner = head_dim * self.n_heads
        B, L, _ = x.shape
        dt = self.dtype

        wq, bq = _DenseParams(self.d_model, inner, name="q_proj")()
        wk, bk = _DenseParams(self.d_model, inner, name="k_proj")()
        wv, bv = _DenseParams(self.d_model, inner, name="v_proj")()
        wo, bo = _DenseParams(inner, self.d_model, name="out_proj")()
        ln1_s, ln1_b = _LNParams(self.d_model, name="norm1")()
        w1, b1 = _DenseParams(self.d_model, self.d_ff, name="ffn_in")()
        w2, b2 = _DenseParams(self.d_ff, self.d_model, name="ffn_out")()
        ln2_s, ln2_b = _LNParams(self.d_model, name="norm2")()

        no_dropout = deterministic or self.dropout == 0.0
        # Both directions are Pallas: the forward kernel plus a native
        # backward that remats inside VMEM (ops/attention.py::_bwd_kernel),
        # so training — including dropout drawn by the in-kernel TPU PRNG —
        # runs fully fused. Off-TPU the hardware PRNG doesn't exist
        # (interpret mode stubs it), so dropout training falls back to XLA.
        on_tpu = jax.default_backend() == "tpu"
        if self._use_fused() and dropout_masks is None and (
            no_dropout or on_tpu
        ):
            params = {
                "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
                "wo": wo, "bo": bo, "ln1_s": ln1_s, "ln1_b": ln1_b,
                "w1": w1, "b1": b1, "w2": w2, "b2": b2,
                "ln2_s": ln2_s, "ln2_b": ln2_b,
            }
            params = jax.tree_util.tree_map(lambda p: p.astype(dt), params)
            seed = None
            p_drop = 0.0
            if not no_dropout:
                # dropout masks are drawn INSIDE both kernels by the TPU
                # hardware PRNG from this scalar seed — no mask HBM traffic
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, jnp.int32
                )
                p_drop = self.dropout
            return fused_attention_layer(
                x.astype(dt), params, None, self.n_heads,
                jax.default_backend() != "tpu",  # interpret off-TPU
                p_drop, seed,
            )

        def dense(h, w, b):
            return (
                jnp.dot(h.astype(dt), w.astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
                + b.astype(dt)
            )

        def drop(h, mask_name):
            if dropout_masks is not None:
                m = dropout_masks.get(mask_name)
                return h if m is None else h * m.astype(h.dtype)
            return nn.Dropout(self.dropout, deterministic=deterministic)(h)

        q = dense(x, wq, bq).reshape(B, L, self.n_heads, head_dim)
        k = dense(x, wk, bk).reshape(B, L, self.n_heads, head_dim)
        v = dense(x, wv, bv).reshape(B, L, self.n_heads, head_dim)

        scores = jnp.einsum(
            "blhe,bshe->bhls", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / jnp.sqrt(jnp.float32(head_dim)))
        attn = jax.nn.softmax(scores, axis=-1)
        attn = drop(attn, "m_attn")
        out = jnp.einsum(
            "bhls,bshd->blhd", attn.astype(dt), v,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        out = dense(out.reshape(B, L, inner), wo, bo)

        def ln(h, s, b):
            h32 = h.astype(jnp.float32)
            mu = h32.mean(-1, keepdims=True)
            var = h32.var(-1, keepdims=True)
            return ((h32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b).astype(dt)

        # post-norm residual (ref :45-51)
        x = x + drop(out, "m_res")
        x = ln(x, ln1_s, ln1_b)
        y = dense(x, w1, b1)
        # default: tanh-gelu to match the fused kernel (Mosaic lowers neither
        # erf/erfc); exact_gelu=True restores the reference's erf GELU
        # (Transformer_EncDec.py:33-41) for converted-checkpoint fidelity
        y = drop(nn.gelu(y, approximate=not self.exact_gelu), "m_ffn1")
        y = drop(dense(y, w2, b2), "m_ffn2")
        return ln(x + y, ln2_s, ln2_b)


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
        dropout_masks: dict | None = None,
    ) -> jax.Array:
        """``dropout_masks``: optional dict of externally drawn pre-scaled
        keep-masks pinning every stochastic site to explicit values — the
        dropout-placement parity hook (the reference's seven sites:
        ``Embed.py:162``, ``SelfAttention_Family.py:69``,
        ``Transformer_EncDec.py:45,48-49``, ``ATMS_retrieval.py:110,160``).
        Keys: ``"emb"`` (B,C+1,d_model), ``"layer{i}"`` (per-layer dict, see
        :class:`ChannelAttentionLayer`), ``"tsconv"`` (broadcastable to the
        (B,1,P,F) activation), ``"proj"`` (B,proj_dim). Missing keys mean
        keep-all. Only meaningful with ``deterministic=False`` (train-mode
        BatchNorm)."""
        cfg = self.config
        dm = dropout_masks or {}
        h = ChannelTokenEmbedding(
            seq_len=cfg.seq_len,
            d_model=cfg.d_model,
            num_subjects=cfg.num_subjects,
            dropout=cfg.dropout,
            joint_train=cfg.joint_train,
            dtype=self.dtype,
            name="embedding",
        )(x, subject_ids, deterministic=deterministic,
          dropout_mask=dm.get("emb", jnp.ones((), self.dtype))
          if dropout_masks is not None else None)

        for i in range(cfg.n_layers):
            h = ChannelAttentionLayer(
                d_model=cfg.d_model,
                n_heads=cfg.n_heads,
                d_ff=cfg.d_ff,
                dropout=cfg.dropout,
                fused=cfg.fused_attention,
                exact_gelu=getattr(cfg, "exact_gelu", False),
                dtype=self.dtype,
                name=f"encoder_layer_{i}",
            )(h, deterministic=deterministic,
              dropout_masks=dm.get(f"layer{i}", {})
              if dropout_masks is not None else None)
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
            fused_stage1=cfg.fused_tsconv,
            bn1_impl=getattr(cfg, "tsconv_bn1", "flax"),
            dtype=self.dtype,
            name="enc_eeg",
        )(h, deterministic=deterministic,
          dropout_mask=dm.get("tsconv", jnp.ones((), self.dtype))
          if dropout_masks is not None else None)

        return ProjectionHead(
            proj_dim=cfg.proj_dim,
            dropout=cfg.proj_dropout,
            dtype=self.dtype,
            fused=getattr(cfg, "fused_projection", "auto"),
            name="proj_eeg",
        )(tokens, deterministic=deterministic,
          dropout_mask=dm.get("proj", jnp.ones((), self.dtype))
          if dropout_masks is not None else None)

