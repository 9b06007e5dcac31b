"""SDXL/VAE converter tests.

Real diffusers checkpoints aren't available offline, so the test constructs a
torch-style state dict by inverse-mapping a freshly initialized flax tree
(every leaf gets a unique random value), runs the converter, and requires the
result to reproduce the original tree exactly — proving the converter covers
every parameter with the right transpose, against the real consumer (the
model init structure). diffusers key strings follow the published naming.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg_image_decode_tpu.gen.convert import convert_sdxl_unet, convert_sdxl_vae
from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig
from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig


def _init_unet(cfg):
    model = SDXLUNet(cfg, dtype=jnp.float32)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 4, cfg.cross_attention_dim))
    emb = jnp.zeros((1, cfg.ip_image_embed_dim))
    v = model.init(jax.random.key(0), lat, jnp.zeros((1,), jnp.int32), ctx,
                   None, None, emb)
    return model, v["params"]


def _inv_leaf(path_parts, leaf):
    """flax leaf → (torch-ish transform) value. kernel 4D→OIHW, 2D→(out,in)."""
    name = path_parts[-1]
    arr = np.asarray(leaf)
    if name == "kernel" and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    if name == "kernel" and arr.ndim == 2:
        return arr.T
    return arr


def _unet_torch_name(parts):
    """our param path → diffusers key (tiny config layout)."""
    top = parts[0]
    tail = parts[1:]

    def lin(pre, sub):
        # sub = (layer..., kernel|bias)
        leaf = {"kernel": "weight", "bias": "bias",
                "scale": "weight"}[sub[-1]]
        return f"{pre}.{leaf}"

    def resnet(pre, sub):
        return lin(f"{pre}.{sub[0]}" if sub[0] != "conv_shortcut"
                   else f"{pre}.conv_shortcut", sub)

    def attn_inner(pre, sub):
        # sub within a TransformerBlock
        m = sub[0]
        if m in ("norm1", "norm2", "norm3"):
            return lin(f"{pre}.{m}", sub)
        if m in ("attn1", "attn2"):
            proj = sub[1]
            if proj == "to_out":
                return lin(f"{pre}.{m}.to_out.0", sub)
            if proj in ("ip_to_k", "ip_to_v"):
                return None  # handled via the ip_adapter dict
            return lin(f"{pre}.{m}.{proj}", sub)
        if m == "ff":
            inner = {"proj_in": "net.0.proj", "proj_out": "net.2"}[sub[1]]
            return lin(f"{pre}.ff.{inner}", sub)
        raise KeyError(sub)

    def spatial(pre, sub):
        m = sub[0]
        if m in ("norm", "proj_in", "proj_out"):
            return lin(f"{pre}.{m}", sub)
        k = int(m.split("_")[1])
        return attn_inner(f"{pre}.transformer_blocks.{k}", sub[1:])

    if top == "conv_in":
        return lin("conv_in", tail)
    if top == "conv_out":
        return lin("conv_out", tail)
    if top == "norm_out":
        return lin("conv_norm_out", tail)
    if top == "time_embed_1":
        return lin("time_embedding.linear_1", tail)
    if top == "time_embed_2":
        return lin("time_embedding.linear_2", tail)
    if top == "add_embed_1":
        return lin("add_embedding.linear_1", tail)
    if top == "add_embed_2":
        return lin("add_embedding.linear_2", tail)
    if top in ("ip_image_proj", "ip_norm"):
        return None  # ip_adapter dict
    seg = top.split("_")
    if seg[0] == "down":
        i = int(seg[1])
        if seg[2] == "res":
            return resnet(f"down_blocks.{i}.resnets.{seg[3]}", tail)
        if seg[2] == "attn":
            return spatial(f"down_blocks.{i}.attentions.{seg[3]}", tail)
        if seg[2] == "downsample":
            return lin(f"down_blocks.{i}.downsamplers.0.conv", tail)
    if seg[0] == "mid":
        if seg[1] == "res":
            return resnet(f"mid_block.resnets.{seg[2]}", tail)
        return spatial("mid_block.attentions.0", tail)
    if seg[0] == "up":
        i = int(seg[1])
        if seg[2] == "res":
            return resnet(f"up_blocks.{i}.resnets.{seg[3]}", tail)
        if seg[2] == "attn":
            return spatial(f"up_blocks.{i}.attentions.{seg[3]}", tail)
        if seg[2] == "upsample":
            return lin(f"up_blocks.{i}.upsamplers.0.conv", tail)
    raise KeyError(parts)


def _paths(tree):
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        parts = [p.key for p in path]
        out.append((parts, leaf))
    return out


def test_unet_converter_roundtrip():
    cfg = SDXLUNetConfig.tiny()
    model, params = _init_unet(cfg)

    sd, ip_sd = {}, {}
    ip_idx = 0
    ip_layer_names = []
    for parts, leaf in _paths(params):
        name = _unet_torch_name(parts)
        val = _inv_leaf(parts, leaf)
        if name is not None:
            assert name not in sd, f"duplicate {name} from {parts}"
            sd[name] = val
    # ip adapter dict: image proj + per-attn2 to_k/v in traversal order
    ip_sd["image_proj.proj.weight"] = _inv_leaf(
        ["kernel"], params["ip_image_proj"]["kernel"])
    ip_sd["image_proj.proj.bias"] = np.asarray(params["ip_image_proj"]["bias"])
    ip_sd["image_proj.norm.weight"] = np.asarray(params["ip_norm"]["scale"])
    ip_sd["image_proj.norm.bias"] = np.asarray(params["ip_norm"]["bias"])
    # checkpoint enumeration order: down blocks, up blocks, mid (module
    # registration order, the order the real file's indices follow)
    order = []
    for key in ["down_1_attn_0", "up_0_attn_0", "up_0_attn_1", "mid_attn"]:
        if key in params:
            st = params[key]
            for k in sorted(b for b in st if b.startswith("block_")):
                order.append(st[k]["attn2"])
    for i, attn2 in enumerate(order):
        ip_sd[f"ip_adapter.{i}.to_k_ip.weight"] = _inv_leaf(
            ["kernel"], attn2["ip_to_k"]["kernel"])
        ip_sd[f"ip_adapter.{i}.to_v_ip.weight"] = _inv_leaf(
            ["kernel"], attn2["ip_to_v"]["kernel"])

    got = convert_sdxl_unet(sd, cfg, ip_adapter_sd=ip_sd)

    ref = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(params)}
    new = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(got)}
    assert set(ref) == set(new), (
        sorted(set(ref) - set(new))[:5], sorted(set(new) - set(ref))[:5])
    for k in ref:
        np.testing.assert_array_equal(ref[k], new[k], err_msg=k)

    # and the converted tree must actually run
    lat = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 4, cfg.cross_attention_dim))
    emb = jnp.ones((1, cfg.ip_image_embed_dim))
    out = model.apply({"params": got}, lat, jnp.zeros((1,), jnp.int32), ctx,
                      None, None, emb)
    assert out.shape == (1, 8, 8, 4)


def _vae_torch_name(parts):
    tower = parts[0]
    tail = parts[1:]

    def lin(pre, sub):
        leaf = {"kernel": "weight", "bias": "bias", "scale": "weight"}[sub[-1]]
        return f"{pre}.{leaf}"

    if tower in ("quant_conv", "post_quant_conv"):
        return lin(tower, tail)
    pre = tower  # 'encoder' or 'decoder'
    top = tail[0]
    sub = tail[1:]
    seg = top.split("_")
    if top == "conv_in":
        return lin(f"{pre}.conv_in", sub)
    if top == "conv_out":
        return lin(f"{pre}.conv_out", sub)
    if top == "norm_out":
        return lin(f"{pre}.conv_norm_out", sub)
    if seg[0] == "mid" and seg[1] == "res":
        base = f"{pre}.mid_block.resnets.{seg[2]}"
    elif seg[0] == "mid":
        m = sub[0]
        name = {"norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
                "to_v": "to_v", "to_out": "to_out.0"}[m]
        return lin(f"{pre}.mid_block.attentions.0.{name}", sub)
    elif seg[0] == "down" and seg[2] == "res":
        base = f"{pre}.down_blocks.{seg[1]}.resnets.{seg[3]}"
    elif seg[0] == "down":
        return lin(f"{pre}.down_blocks.{seg[1]}.downsamplers.0.conv", sub)
    elif seg[0] == "up" and seg[2] == "res":
        base = f"{pre}.up_blocks.{seg[1]}.resnets.{seg[3]}"
    else:
        return lin(f"{pre}.up_blocks.{seg[1]}.upsamplers.0.conv", sub)
    inner = {"shortcut": "conv_shortcut"}.get(sub[0], sub[0])
    return lin(f"{base}.{inner}", sub)


def test_vae_converter_roundtrip(rng):
    cfg = VAEConfig.tiny()
    vae = VAE(cfg, dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    params = vae.init(jax.random.key(0), img)["params"]

    sd = {}
    for parts, leaf in _paths(params):
        sd[_vae_torch_name(parts)] = _inv_leaf(parts, leaf)
    got = convert_sdxl_vae(sd, cfg)

    ref = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(params)}
    new = {jax.tree_util.keystr(p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(got)}
    assert set(ref) == set(new), (
        sorted(set(ref) - set(new))[:5], sorted(set(new) - set(ref))[:5])
    for k in ref:
        np.testing.assert_array_equal(ref[k], new[k], err_msg=k)

    rec = vae.apply({"params": got}, img)
    assert rec.shape == img.shape
