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
