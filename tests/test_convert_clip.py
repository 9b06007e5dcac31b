"""OpenCLIP conversion tests: one full residual block converted from a
torch-shaped state_dict must reproduce torch's multi-head attention + QuickGELU
MLP bit-for-bit-ish (the conversion conventions that are easy to get wrong)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from eeg_image_decode_tpu.models.clip_vit import (
    CLIPVisionConfig,
    CLIPVisionTower,
    _ResidualAttnBlock,
)
from eeg_image_decode_tpu.utils.convert_clip import (
    _block,
    convert_openclip_vision,
)

W, H = 32, 4  # width, heads


def _rand_block_sd(rng, prefix="visual.transformer.resblocks.0"):
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.2
    return {
        f"{prefix}.ln_1.weight": np.abs(r(W)) + 0.5,
        f"{prefix}.ln_1.bias": r(W),
        f"{prefix}.attn.in_proj_weight": r(3 * W, W),
        f"{prefix}.attn.in_proj_bias": r(3 * W),
        f"{prefix}.attn.out_proj.weight": r(W, W),
        f"{prefix}.attn.out_proj.bias": r(W),
        f"{prefix}.ln_2.weight": np.abs(r(W)) + 0.5,
        f"{prefix}.ln_2.bias": r(W),
        f"{prefix}.mlp.c_fc.weight": r(4 * W, W),
        f"{prefix}.mlp.c_fc.bias": r(4 * W),
        f"{prefix}.mlp.c_proj.weight": r(W, 4 * W),
        f"{prefix}.mlp.c_proj.bias": r(4 * W)[:W],
    }


def _torch_block(sd, x, prefix="visual.transformer.resblocks.0"):
    """Torch oracle of one CLIP residual block (pre-norm, QuickGELU)."""
    t = {k: torch.tensor(v) for k, v in sd.items()}
    xt = torch.tensor(x)  # (B, L, W)
    h = torch.nn.functional.layer_norm(
        xt, (W,), t[f"{prefix}.ln_1.weight"], t[f"{prefix}.ln_1.bias"]
    )
    # torch MHA expects (L, B, W)
    a, _ = torch.nn.functional.multi_head_attention_forward(
        h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
        W, H,
        t[f"{prefix}.attn.in_proj_weight"], t[f"{prefix}.attn.in_proj_bias"],
        None, None, False, 0.0,
        t[f"{prefix}.attn.out_proj.weight"], t[f"{prefix}.attn.out_proj.bias"],
        need_weights=False,
    )
    xt = xt + a.transpose(0, 1)
    h = torch.nn.functional.layer_norm(
        xt, (W,), t[f"{prefix}.ln_2.weight"], t[f"{prefix}.ln_2.bias"]
    )
    h = torch.nn.functional.linear(
        h, t[f"{prefix}.mlp.c_fc.weight"], t[f"{prefix}.mlp.c_fc.bias"]
    )
    h = h * torch.sigmoid(1.702 * h)
    h = torch.nn.functional.linear(
        h, t[f"{prefix}.mlp.c_proj.weight"], t[f"{prefix}.mlp.c_proj.bias"]
    )
    return (xt + h).numpy()


def test_converted_block_matches_torch_mha(rng):
    sd = _rand_block_sd(rng)
    params = _block(sd, "visual.transformer.resblocks.0", W, H)
    x = rng.normal(size=(2, 6, W)).astype(np.float32)

    block = _ResidualAttnBlock(W, H)
    got = block.apply({"params": params}, jnp.asarray(x))
    want = _torch_block(sd, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_full_vision_conversion_runs(rng):
    cfg = CLIPVisionConfig.tiny()  # width 64, heads 2, layers 2, patch 8
    w, heads = cfg.width, cfg.heads
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    sd = {
        "visual.conv1.weight": r(w, 3, cfg.patch_size, cfg.patch_size),
        "visual.class_embedding": r(w),
        "visual.positional_embedding": r(1 + (cfg.image_size // cfg.patch_size) ** 2, w),
        "visual.ln_pre.weight": np.ones(w, np.float32),
        "visual.ln_pre.bias": np.zeros(w, np.float32),
        "visual.ln_post.weight": np.ones(w, np.float32),
        "visual.ln_post.bias": np.zeros(w, np.float32),
        "visual.proj": r(w, cfg.embed_dim),
    }
    for i in range(cfg.layers):
        p = f"visual.transformer.resblocks.{i}"
        rb = _rand_block_sd(rng, p)
        # fix shapes for this width
        rb = {
            f"{p}.ln_1.weight": np.ones(w, np.float32),
            f"{p}.ln_1.bias": np.zeros(w, np.float32),
            f"{p}.attn.in_proj_weight": r(3 * w, w),
            f"{p}.attn.in_proj_bias": r(3 * w),
            f"{p}.attn.out_proj.weight": r(w, w),
            f"{p}.attn.out_proj.bias": r(w),
            f"{p}.ln_2.weight": np.ones(w, np.float32),
            f"{p}.ln_2.bias": np.zeros(w, np.float32),
            f"{p}.mlp.c_fc.weight": r(4 * w, w),
            f"{p}.mlp.c_fc.bias": r(4 * w),
            f"{p}.mlp.c_proj.weight": r(w, 4 * w),
            f"{p}.mlp.c_proj.bias": r(w),
        }
        sd.update(rb)

    params = convert_openclip_vision(sd, cfg)
    tower = CLIPVisionTower(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    # structure must match a fresh init
    ref = tower.init(jax.random.key(0), imgs)["params"]
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(params)}
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(ref)}
    assert got_paths == ref_paths, (ref_paths - got_paths, got_paths - ref_paths)
    feats = tower.apply({"params": params}, imgs)
    assert feats.shape == (2, cfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(feats)))
