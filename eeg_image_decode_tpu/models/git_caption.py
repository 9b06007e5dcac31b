"""GIT-style captioner conditioned on CLIP embeddings — the semantic-level
pipeline.

Rebuilds the reference's vendored ``GitForCausalLMClipEmb`` + adapter flow
(``Generation/modeling_git.py:1567,1802``; ``image_adapter.ipynb`` cell 3;
``GIT_caption_batch.ipynb`` cell 8): the EEG-predicted ViT-H CLIP embedding is
projected to a grid of GIT visual tokens by ``PixelProjector`` (trained with
MSE against real GIT vision-tower outputs), the visual tokens are prepended
to the text tokens, and a causal decoder generates the caption
(``max_new_tokens=25`` greedy in the reference).

GIT (Wang et al. 2022) is a single self-attention decoder over
[image tokens ‖ text tokens] with causal masking only on the text — rebuilt
here as a config-driven flax module (``GITConfig.git_base()`` matches the real
checkpoint's shapes for weight conversion; ``tiny()`` for tests). Greedy
decode is one ``lax.scan`` over a fixed-length buffer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class GITConfig:
    vocab_size: int = 30522
    d_model: int = 768
    n_layers: int = 6
    n_heads: int = 12
    d_ff: int = 3072
    max_text_len: int = 64
    num_visual_tokens: int = 257
    visual_dim: int = 1024  # CLIP ViT-L/14 grid features GIT consumes
    bos_token_id: int = 101  # BERT [CLS]
    eos_token_id: int = 102  # BERT [SEP]
    dropout: float = 0.1

    @staticmethod
    def git_base() -> "GITConfig":
        return GITConfig()

    @staticmethod
    def tiny() -> "GITConfig":
        return GITConfig(
            vocab_size=64, d_model=32, n_layers=2, n_heads=2, d_ff=64,
            max_text_len=8, num_visual_tokens=3, visual_dim=16,
            bos_token_id=1, eos_token_id=2,
        )


class PixelProjector(nn.Module):
    """ViT-H CLIP embedding (B, 1024) → GIT visual tokens (B, 257, 1024)
    (ref ``image_adapter.ipynb`` cell 3, trained with MSE against the real
    GIT vision tower on the same images)."""

    num_tokens: int = 257
    out_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_embeds: jax.Array) -> jax.Array:
        h = nn.Dense(self.num_tokens * self.out_dim, dtype=self.dtype,
                     name="expand")(clip_embeds.astype(self.dtype))
        h = h.reshape(h.shape[0], self.num_tokens, self.out_dim)
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(h)


class _DecoderLayer(nn.Module):
    cfg: GITConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.n_heads, dtype=self.dtype,
            dropout_rate=self.cfg.dropout, deterministic=deterministic,
            name="attn",
        )(h, h, mask=mask)
        x = x + a
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        f = nn.Dense(self.cfg.d_ff, dtype=self.dtype, name="ff1")(h)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.cfg.d_model, dtype=self.dtype, name="ff2")(f)
        return x + f


class GITCaptioner(nn.Module):
    config: GITConfig = GITConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual_tokens: jax.Array,  # (B, V, visual_dim)
        token_ids: jax.Array,  # (B, L) int32
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """→ logits (B, L, vocab) for the text positions."""
        cfg = self.config
        B, V = visual_tokens.shape[:2]
        L = token_ids.shape[1]

        vis = nn.Dense(cfg.d_model, dtype=self.dtype, name="visual_proj")(
            visual_tokens.astype(self.dtype)
        )
        tok = nn.Embed(cfg.vocab_size, cfg.d_model, name="token_embed")(
            token_ids
        ).astype(self.dtype)
        pos = nn.Embed(cfg.max_text_len, cfg.d_model, name="pos_embed")(
            jnp.arange(L)
        ).astype(self.dtype)
        x = jnp.concatenate([vis, tok + pos[None]], axis=1)  # (B, V+L, D)

        # GIT mask: image queries attend bidirectionally over image tokens;
        # text query i sees all image tokens + text ≤ i (plain causal, since
        # every image position precedes every text position)
        n = V + L
        is_text_q = jnp.arange(n) >= V
        qi = jnp.arange(n)[:, None]
        kj = jnp.arange(n)[None, :]
        causal = kj <= qi
        vis_kv = kj < V
        mask = jnp.where(is_text_q[:, None], causal, vis_kv)
        mask = jnp.broadcast_to(mask, (B, 1, n, n))

        for i in range(cfg.n_layers):
            x = _DecoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, mask, deterministic=deterministic
            )
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32, name="lm_head")(
            x[:, V:]
        )
        return logits

    def generate(
        self,
        variables,
        visual_tokens: jax.Array,
        *,
        max_new_tokens: int = 25,
    ) -> jax.Array:
        """Greedy decode (ref ``GIT_caption_batch.ipynb`` cell 8 uses
        ``max_new_tokens=25``). Fixed-size buffer + lax.scan; recomputes the
        full forward per step (fine at these lengths; caption length ≤ 64)."""
        cfg = self.config
        B = visual_tokens.shape[0]
        buf_len = min(cfg.max_text_len, max_new_tokens + 1)
        tokens = jnp.full((B, buf_len), cfg.eos_token_id, jnp.int32)
        tokens = tokens.at[:, 0].set(cfg.bos_token_id)
        done = jnp.zeros((B,), bool)

        def body(carry, i):
            tokens, done = carry
            logits = self.apply(variables, visual_tokens, tokens,
                                deterministic=True)
            step_logits = jnp.take(logits, i - 1, axis=1)  # (B, vocab)
            next_tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            next_tok = jnp.where(done, cfg.eos_token_id, next_tok)
            tokens = tokens.at[:, i].set(next_tok)
            done = done | (next_tok == cfg.eos_token_id)
            return (tokens, done), None

        n_steps = buf_len - 1
        (tokens, _), _ = jax.lax.scan(
            body, (tokens, done), jnp.arange(1, n_steps + 1)
        )
        return tokens
