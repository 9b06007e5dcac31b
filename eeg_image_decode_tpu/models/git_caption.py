"""GIT captioner conditioned on CLIP embeddings — the semantic-level pipeline.

Rebuilds the reference's vendored ``GitForCausalLMClipEmb`` + adapter flow
(``Generation/modeling_git.py:1567,1802``; ``image_adapter.ipynb`` cell 3;
``GIT_caption_batch.ipynb`` — ``microsoft/git-large-coco``): the
EEG-predicted ViT-H CLIP embedding is projected to the GIT visual-token grid
by ``PixelProjector`` (trained with MSE against the real GIT vision tower),
the projected visual tokens are prepended to the text tokens, and a causal
decoder generates the caption (greedy, ``max_new_tokens`` budget).

The decoder mirrors the real GIT checkpoint exactly — BERT-style POST-LN
blocks (eps 1e-12, exact gelu), word+position embeddings with their own
LayerNorm, a Linear+LN visual projection (eps 1e-5), an untied lm head —
so converted ``git-large-coco`` weights reproduce the torch model
token-for-token (pinned by the ``transformers.GitForCausalLM`` oracle test).
Greedy decode is one ``lax.scan`` over a fixed-length buffer.

Attention layout (GIT, Wang et al. 2022): image queries attend only to image
tokens; text query i attends to all image tokens + text ≤ i
(``GitModel.create_attention_mask``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

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
    #: size of the learned position table (GIT checkpoints: 1024)
    max_position_embeddings: int = 1024
    #: decode buffer length (caption budget)
    max_text_len: int = 64
    num_visual_tokens: int = 257
    visual_dim: int = 1024  # CLIP ViT-L/14 grid features GIT-large consumes
    bos_token_id: int = 101  # BERT [CLS]
    eos_token_id: int = 102  # BERT [SEP]
    pad_token_id: int = 0
    dropout: float = 0.1

    @staticmethod
    def git_large_coco() -> "GITConfig":
        """microsoft/git-large-coco (the reference's checkpoint,
        ``GIT_caption_batch.ipynb``): 1024-wide 6-layer decoder with 16
        heads / 4096 FFN over CLIP ViT-L/14 grids (GIT scales the width
        and the vision tower, not the decoder depth — Wang et al. 2022
        §4.1; transformers ``microsoft/git-large-coco`` config.json).

        When converting a real checkpoint prefer
        :func:`git_config_from_state_dict`, which derives every dimension
        from the weights themselves and cannot go stale.
        """
        return GITConfig(d_model=1024, n_heads=16, d_ff=4096)

    @staticmethod
    def git_base() -> "GITConfig":
        """microsoft/git-base (transformers ``GitConfig()`` defaults)."""
        return GITConfig()

    @staticmethod
    def tiny() -> "GITConfig":
        return GITConfig(
            vocab_size=64, d_model=32, n_layers=2, n_heads=2, d_ff=64,
            max_position_embeddings=16, max_text_len=8, num_visual_tokens=3,
            visual_dim=16, bos_token_id=1, eos_token_id=2,
        )


class PixelProjector(nn.Module):
    """ViT-H CLIP embedding (B, 1024) → GIT visual tokens (B, 257, 1024).

    Mirrors the reference adapter exactly (``image_adapter.ipynb`` cell 3,
    trained with MSE against the real GIT ViT-L/14 grid): each embedding
    channel is expanded to 257 tokens by a shared Linear(1→257) + LayerNorm
    over the token axis, then a per-token Linear(D→out) + LayerNorm. The
    factorized form is ~1M params (vs 263M for a naive dense expansion) and
    the trained ``PixelProjector_best.bin`` converts onto it via
    :func:`convert_pixel_projector`.
    """

    num_tokens: int = 257
    out_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_embeds: jax.Array) -> jax.Array:
        x = clip_embeds.astype(self.dtype)[:, :, None]  # (B, D, 1)
        x = nn.Dense(self.num_tokens, dtype=self.dtype, name="expand")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_tokens")(x)
        x = x.transpose(0, 2, 1).astype(self.dtype)  # (B, tokens, D)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(x)


class _GITLayer(nn.Module):
    """BERT-style post-LN block (``GitLayer``: SelfAttention + SelfOutput,
    Intermediate + Output; LN eps 1e-12, exact gelu)."""

    cfg: GITConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.n_heads, dtype=self.dtype,
            dropout_rate=self.cfg.dropout, deterministic=deterministic,
            name="attn",
        )(x, x, mask=mask)
        a = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(a)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_attn")(
            x + a
        ).astype(self.dtype)
        f = nn.Dense(self.cfg.d_ff, dtype=self.dtype, name="ff1")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.cfg.d_model, dtype=self.dtype, name="ff2")(f)
        f = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(f)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_ff")(
            x + f
        ).astype(self.dtype)


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

        # GitProjection: Linear + LayerNorm (vision eps 1e-5); no positions
        vis = nn.Dense(cfg.d_model, dtype=self.dtype, name="visual_proj")(
            visual_tokens.astype(self.dtype)
        )
        vis = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="visual_ln")(vis).astype(self.dtype)
        # GitEmbeddings: word + absolute position (text starts at 0), LN 1e-12
        tok = nn.Embed(cfg.vocab_size, cfg.d_model, name="token_embed")(
            token_ids
        ).astype(self.dtype)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.d_model,
                       name="pos_embed")(jnp.arange(L)).astype(self.dtype)
        txt = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                           name="embed_ln")(tok + pos[None]).astype(self.dtype)
        txt = nn.Dropout(cfg.dropout, deterministic=deterministic)(txt)
        x = jnp.concatenate([vis, txt], axis=1)  # (B, V+L, D)

        # GIT mask: image queries attend only over image tokens; text query i
        # sees all image tokens + text ≤ i (ref create_attention_mask)
        n = V + L
        is_text_q = jnp.arange(n) >= V
        qi = jnp.arange(n)[:, None]
        kj = jnp.arange(n)[None, :]
        causal = kj <= qi
        vis_kv = kj < V
        mask = jnp.where(is_text_q[:, None], causal, vis_kv)
        mask = jnp.broadcast_to(mask, (B, 1, n, n))

        for i in range(cfg.n_layers):
            x = _GITLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, mask, deterministic=deterministic
            )
        # untied lm head, no final LN (GitForCausalLM.output)
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
        """Greedy decode (ref ``GIT_caption_batch.ipynb`` uses greedy with a
        fixed ``max_new_tokens`` budget). Fixed-size buffer + lax.scan;
        recomputes the full forward per step (the whole decode is 51 GFLOP /
        ~8 ms device time at caption lengths — KV caching is not worth its
        complexity here). The decode is jit-compiled as ONE program (cached
        per shape/budget): eagerly it is tens of per-op dispatches, which
        cost ~25 ms each through a remote-device tunnel. Finished rows are
        padded with ``pad_token_id`` like HF generate."""
        return _decode_jit(self, int(max_new_tokens), variables,
                           visual_tokens)


@partial(jax.jit, static_argnums=(0, 1))
def _decode_jit(model: "GITCaptioner", max_new_tokens: int, variables,
                visual_tokens: jax.Array) -> jax.Array:
    """The greedy-decode loop as one compiled program (model and budget are
    static; ``GITCaptioner``/``GITConfig`` are frozen dataclasses, so the
    trace is cached per (config, dtype, budget, shapes))."""
    cfg = model.config
    B = visual_tokens.shape[0]
    buf_len = min(cfg.max_text_len, max_new_tokens + 1)
    tokens = jnp.full((B, buf_len), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.bos_token_id)
    done = jnp.zeros((B,), bool)

    def body(carry, i):
        tokens, done = carry
        logits = model.apply(variables, visual_tokens, tokens,
                             deterministic=True)
        step_logits = jnp.take(logits, i - 1, axis=1)  # (B, vocab)
        next_tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, cfg.pad_token_id, next_tok)
        tokens = tokens.at[:, i].set(next_tok)
        done = done | (next_tok == cfg.eos_token_id)
        return (tokens, done), None

    n_steps = buf_len - 1
    (tokens, _), _ = jax.lax.scan(
        body, (tokens, done), jnp.arange(1, n_steps + 1)
    )
    return tokens


def caption_embeddings(
    captioner: GITCaptioner,
    variables,
    projector_params: dict,
    clip_embeds: jax.Array,
    tokenizer,
    *,
    max_new_tokens: int = 25,
) -> list[str]:
    """EEG-predicted CLIP embeddings → caption strings — the reference's
    ``GIT_caption_batch.ipynb`` cell 8 flow (PixelProjector → greedy GIT →
    WordPiece decode)."""
    cfg = captioner.config
    proj = PixelProjector(num_tokens=cfg.num_visual_tokens,
                          out_dim=cfg.visual_dim, dtype=captioner.dtype)
    grids = proj.apply({"params": projector_params},
                       jnp.asarray(clip_embeds))
    tokens = np.asarray(
        captioner.generate(variables, grids, max_new_tokens=max_new_tokens)
    )
    return [tokenizer.decode(row) for row in tokens]


# ——————————————————— checkpoint conversion (GitForCausalLM) ———————————————————


def _t_ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _t_linear(sd, p):
    return {"kernel": np.asarray(sd[f"{p}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def convert_pixel_projector(sd: dict) -> dict:
    """Reference ``PixelProjector_best.bin`` (torch Sequential indices:
    1=Linear(1,257), 2=LayerNorm(257), 4=Linear(1024,1024), 5=LayerNorm)
    → flax :class:`PixelProjector` params."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    return {
        "expand": {"kernel": sd["1.weight"].T, "bias": sd["1.bias"]},
        "ln_tokens": {"scale": sd["2.weight"], "bias": sd["2.bias"]},
        "proj": {"kernel": sd["4.weight"].T, "bias": sd["4.bias"]},
        "ln": {"scale": sd["5.weight"], "bias": sd["5.bias"]},
    }


def git_config_from_state_dict(
    sd: dict,
    *,
    n_heads: int | None = None,
    **overrides,
) -> GITConfig:
    """Derive a :class:`GITConfig` from a ``GitForCausalLM`` state dict.

    Every decoder dimension is read off the weights themselves —
    ``vocab_size``/``d_model`` from the word-embedding table,
    ``max_position_embeddings`` from the position table, ``d_ff`` from
    ``intermediate.dense``, ``visual_dim`` from the visual projection, and
    ``n_layers`` from the highest ``git.encoder.layer.{i}`` index — so a
    checkpoint with a different shape than the hard-coded presets (e.g.
    git-base vs git-large) converts correctly instead of silently
    truncating. ``n_heads`` is the one dimension a state dict cannot
    encode; GIT uses 64-wide heads in every released size (768/12,
    1024/16), so it defaults to ``d_model // 64`` — pass it explicitly for
    a non-standard checkpoint. Decode-time fields (``max_text_len``,
    token ids, ``num_visual_tokens``, ``dropout``) keep their defaults
    unless overridden via keyword.
    """
    word = np.asarray(sd["git.embeddings.word_embeddings.weight"])
    vocab_size, d_model = word.shape
    max_pos = int(np.asarray(
        sd["git.embeddings.position_embeddings.weight"]).shape[0])
    d_ff = int(np.asarray(
        sd["git.encoder.layer.0.intermediate.dense.weight"]).shape[0])
    visual_dim = int(np.asarray(
        sd["git.visual_projection.visual_projection.0.weight"]).shape[1])
    layer_ids = set()
    for k in sd:
        if k.startswith("git.encoder.layer."):
            layer_ids.add(int(k.split(".")[3]))
    n_layers = max(layer_ids) + 1
    if layer_ids != set(range(n_layers)):
        raise ValueError(
            f"non-contiguous git.encoder.layer indices: {sorted(layer_ids)}")
    if n_heads is None:
        if d_model % 64:
            raise ValueError(
                f"d_model={d_model} is not a multiple of 64; pass n_heads= "
                "explicitly for this checkpoint")
        n_heads = d_model // 64
    fields = dict(
        vocab_size=int(vocab_size), d_model=int(d_model), n_layers=n_layers,
        n_heads=int(n_heads), d_ff=d_ff, max_position_embeddings=max_pos,
        visual_dim=visual_dim,
    )
    fields.update(overrides)
    return GITConfig(**fields)


def git_config_from_params(params: dict, *, n_heads: int | None = None,
                           **overrides) -> GITConfig:
    """Derive a :class:`GITConfig` from already-converted flax params (the
    output of :func:`convert_git_causal_lm`), so loaders of pickled params
    build a decoder of the right shape instead of trusting a preset."""
    vocab_size, d_model = np.shape(params["token_embed"]["embedding"])
    max_pos = int(np.shape(params["pos_embed"]["embedding"])[0])
    d_ff = int(np.shape(params["layer_0"]["ff1"]["kernel"])[1])
    visual_dim = int(np.shape(params["visual_proj"]["kernel"])[0])
    n_layers = 1 + max(
        int(k.split("_")[1]) for k in params if k.startswith("layer_"))
    if n_heads is None:
        n_heads = int(np.shape(params["layer_0"]["attn"]["query"]["bias"])[0])
    fields = dict(
        vocab_size=int(vocab_size), d_model=int(d_model), n_layers=n_layers,
        n_heads=n_heads, d_ff=d_ff, max_position_embeddings=max_pos,
        visual_dim=visual_dim,
    )
    fields.update(overrides)
    return GITConfig(**fields)


def convert_git_causal_lm(sd: dict, cfg: GITConfig | None = None) -> dict:
    """``GitForCausalLM`` / the reference's ``GitForCausalLMClipEmb``
    state_dict → flax :class:`GITCaptioner` params.

    The torch naming follows ``Generation/modeling_git.py:1567-1802``
    (identical to transformers'): ``git.embeddings.*``,
    ``git.visual_projection.visual_projection.{0,1}``,
    ``git.encoder.layer.{i}.attention.self.{query,key,value}`` /
    ``attention.output``, ``intermediate`` / ``output``, and the untied
    ``output`` lm head. The vision tower (``git.image_encoder.*``) is NOT
    consumed here — ``GitForCausalLMClipEmb`` takes precomputed CLIP grids;
    convert it separately via
    :func:`eeg_image_decode_tpu.utils.convert_clip.convert_hf_clip_vision`.

    With ``cfg=None`` (the recommended path) the decoder shape is derived
    from the state dict via :func:`git_config_from_state_dict`. A config
    passed explicitly is VALIDATED against the weights — a mismatch (e.g. a
    checkpoint with more layers than ``cfg.n_layers``) raises instead of
    silently truncating the model.
    """
    if cfg is None:
        cfg = derived = git_config_from_state_dict(sd)
    else:
        derived = git_config_from_state_dict(sd, n_heads=cfg.n_heads)
        mismatches = [
            f"{f}: cfg={getattr(cfg, f)} checkpoint={getattr(derived, f)}"
            for f in ("vocab_size", "d_model", "n_layers", "d_ff",
                      "max_position_embeddings", "visual_dim")
            if getattr(cfg, f) != getattr(derived, f)
        ]
        if cfg.d_model % cfg.n_heads:
            mismatches.append(
                f"n_heads: {cfg.n_heads} does not divide d_model")
        if mismatches:
            raise ValueError(
                "GITConfig does not match the checkpoint ("
                + "; ".join(mismatches)
                + ") — use git_config_from_state_dict(sd) or fix the config")
    sd = {k: np.asarray(v) for k, v in sd.items()}
    heads, d = cfg.n_heads, cfg.d_model
    head_dim = d // heads

    def fold_qkv(p):
        w = np.asarray(sd[f"{p}.weight"], np.float32)
        b = np.asarray(sd[f"{p}.bias"], np.float32)
        return {
            "kernel": np.ascontiguousarray(w.T.reshape(d, heads, head_dim)),
            "bias": b.reshape(heads, head_dim),
        }

    params = {
        "token_embed": {"embedding": np.asarray(
            sd["git.embeddings.word_embeddings.weight"], np.float32)},
        "pos_embed": {"embedding": np.asarray(
            sd["git.embeddings.position_embeddings.weight"], np.float32)},
        "embed_ln": _t_ln(sd, "git.embeddings.LayerNorm"),
        "visual_proj": _t_linear(
            sd, "git.visual_projection.visual_projection.0"),
        "visual_ln": _t_ln(sd, "git.visual_projection.visual_projection.1"),
        "lm_head": _t_linear(sd, "output"),
    }
    for i in range(cfg.n_layers):
        p = f"git.encoder.layer.{i}"
        w_out = np.asarray(sd[f"{p}.attention.output.dense.weight"],
                           np.float32)
        params[f"layer_{i}"] = {
            "attn": {
                "query": fold_qkv(f"{p}.attention.self.query"),
                "key": fold_qkv(f"{p}.attention.self.key"),
                "value": fold_qkv(f"{p}.attention.self.value"),
                "out": {
                    "kernel": np.ascontiguousarray(
                        w_out.T.reshape(heads, head_dim, d)
                    ),
                    "bias": np.asarray(
                        sd[f"{p}.attention.output.dense.bias"], np.float32
                    ),
                },
            },
            "ln_attn": _t_ln(sd, f"{p}.attention.output.LayerNorm"),
            "ff1": _t_linear(sd, f"{p}.intermediate.dense"),
            "ff2": _t_linear(sd, f"{p}.output.dense"),
            "ln_ff": _t_ln(sd, f"{p}.output.LayerNorm"),
        }
    return params
