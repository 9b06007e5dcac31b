"""OpenCLIP checkpoint → flax CLIP tower conversion.

Maps the torch ``state_dict`` of OpenCLIP models (the reference's frozen
ViT-H/14 laion2b extractor, ``Retrieval/eegdatasets_leaveone.py:18-21``) onto
``models/clip_vit.py`` param trees, so feature caches can be computed on TPU.

Key conventions:
- torch MultiheadAttention packs QKV as ``in_proj_weight`` (3W, W) → split +
  reshape to flax MHDPA's (W, heads, head_dim) kernels; out_proj (W, W) →
  (heads, head_dim, W).
- torch Linear (out, in) → flax (in, out); patch conv (W, 3, P, P) → HWIO.
"""

from __future__ import annotations

import numpy as np

from eeg_image_decode_tpu.models.clip_vit import CLIPTextConfig, CLIPVisionConfig


def _ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def _attn(sd, prefix, width, heads):
    head_dim = width // heads
    w_in = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3W, W)
    b_in = np.asarray(sd[f"{prefix}.in_proj_bias"])
    wq, wk, wv = np.split(w_in, 3, axis=0)
    bq, bk, bv = np.split(b_in, 3, axis=0)

    def fold(w, b):
        # torch (W_out, W_in) → flax kernel (W_in, heads, head_dim)
        return {
            "kernel": np.ascontiguousarray(w.T.reshape(width, heads, head_dim)),
            "bias": b.reshape(heads, head_dim),
        }

    w_out = np.asarray(sd[f"{prefix}.out_proj.weight"])  # (W, W)
    b_out = np.asarray(sd[f"{prefix}.out_proj.bias"])
    return {
        "query": fold(wq, bq),
        "key": fold(wk, bk),
        "value": fold(wv, bv),
        "out": {
            "kernel": np.ascontiguousarray(
                w_out.T.reshape(heads, head_dim, width)
            ),
            "bias": b_out,
        },
    }


def _block(sd, prefix, width, heads):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn": _attn(sd, f"{prefix}.attn", width, heads),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp_fc": {
            "kernel": np.asarray(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.mlp.c_fc.bias"]),
        },
        "mlp_proj": {
            "kernel": np.asarray(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def convert_openclip_vision(sd: dict, cfg: CLIPVisionConfig) -> dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "patch_embed": {
            "kernel": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0)),
        },
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }
    for i in range(cfg.layers):
        params[f"block_{i}"] = _block(
            sd, f"visual.transformer.resblocks.{i}", cfg.width, cfg.heads
        )
    return params


def _hf_attn(sd, prefix, width, heads):
    """transformers CLIP attention (separate q/k/v/out Linears) → flax MHDPA."""
    head_dim = width // heads

    def fold(p):
        w = np.asarray(sd[f"{prefix}.{p}_proj.weight"])
        b = np.asarray(sd[f"{prefix}.{p}_proj.bias"])
        return {
            "kernel": np.ascontiguousarray(w.T.reshape(width, heads, head_dim)),
            "bias": b.reshape(heads, head_dim),
        }

    w_out = np.asarray(sd[f"{prefix}.out_proj.weight"])
    return {
        "query": fold("q"),
        "key": fold("k"),
        "value": fold("v"),
        "out": {
            "kernel": np.ascontiguousarray(
                w_out.T.reshape(heads, head_dim, width)
            ),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _hf_block(sd, prefix, width, heads):
    return {
        "ln_1": _ln(sd, f"{prefix}.layer_norm1"),
        "attn": _hf_attn(sd, f"{prefix}.self_attn", width, heads),
        "ln_2": _ln(sd, f"{prefix}.layer_norm2"),
        "mlp_fc": {
            "kernel": np.asarray(sd[f"{prefix}.mlp.fc1.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.mlp.fc1.bias"]),
        },
        "mlp_proj": {
            "kernel": np.asarray(sd[f"{prefix}.mlp.fc2.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.mlp.fc2.bias"]),
        },
    }


def convert_hf_clip_vision(sd: dict, cfg: CLIPVisionConfig) -> dict:
    """transformers ``CLIPVisionModel(WithProjection)`` / GIT's
    ``git.image_encoder`` (strip that prefix first) → flax
    :class:`~eeg_image_decode_tpu.models.clip_vit.CLIPVisionTower` params.

    ``visual_projection.weight`` exists only on the WithProjection variant;
    grid consumers (GIT, ``return_grid=True``) never use ``proj``, so an
    identity fills in when absent.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    v = "vision_model"
    params = {
        "patch_embed": {
            "kernel": np.transpose(
                sd[f"{v}.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            ),
        },
        "class_embedding": sd[f"{v}.embeddings.class_embedding"].reshape(-1),
        "positional_embedding": sd[f"{v}.embeddings.position_embedding.weight"],
        # transformers keeps CLIP's historical "pre_layrnorm" typo
        "ln_pre": _ln(sd, f"{v}.pre_layrnorm"),
        "ln_post": _ln(sd, f"{v}.post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        params["proj"] = np.asarray(sd["visual_projection.weight"]).T
    else:
        assert cfg.width == cfg.embed_dim, (
            "projection-free checkpoint needs width == embed_dim (grid "
            "consumers never use proj)"
        )
        params["proj"] = np.eye(cfg.width, dtype=np.float32)
    for i in range(cfg.layers):
        params[f"block_{i}"] = _hf_block(
            sd, f"{v}.encoder.layers.{i}", cfg.width, cfg.heads
        )
    return params


def convert_openclip_text(sd: dict, cfg: CLIPTextConfig) -> dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    for i in range(cfg.layers):
        params[f"block_{i}"] = _block(
            sd, f"transformer.resblocks.{i}", cfg.width, cfg.heads
        )
    return params
