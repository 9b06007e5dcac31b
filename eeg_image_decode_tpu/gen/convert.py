"""diffusers SDXL checkpoint → flax param-tree conversion.

Maps ``UNet2DConditionModel`` / ``AutoencoderKL`` state dicts (torch naming,
load safetensors with any reader into a {name: np.ndarray} dict) onto
``gen/unet.py`` / ``gen/vae.py`` trees, plus the IP-Adapter extra projections
(``ip-adapter_sdxl_vit-h``: an image-projection head + per-cross-attention
``to_k_ip``/``to_v_ip`` weights). This is the bridge that lets real
SDXL-turbo weights run in the jitted TPU sampling loop.

Conventions: torch Linear (out,in)→(in,out); Conv (O,I,kH,kW)→HWIO;
GroupNorm weight/bias→scale/bias. GEGLU split order (hidden‖gate) matches
diffusers. The IP-Adapter checkpoint (``ip_adapter.{idx}.to_{k,v}_ip.weight``)
is indexed by the saved ``ModuleList(unet.attn_processors.values())``
position: attn1 processors carry no params, so the surviving indices are the
odd ones (1, 3, …, 139 for SDXL), and the enumeration order is module
REGISTRATION order — ``down_blocks``, ``up_blocks``, then ``mid_block``
(both ModuleLists are created before ``mid_block`` is assigned in
``UNet2DConditionModel.__init__``). We consume entries sorted by index and
assign them in that down→up→mid order; each entry's shape is checked against
its target cross-attention so a mis-ordered checkpoint fails loudly instead
of silently loading transposed-stage weights.
"""

from __future__ import annotations

import numpy as np

from eeg_image_decode_tpu.gen.unet import SDXLUNetConfig
from eeg_image_decode_tpu.gen.vae import VAEConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(sd, p, bias=True):
    out = {"kernel": np.ascontiguousarray(
        np.transpose(np.asarray(sd[f"{p}.weight"]), (2, 3, 1, 0)))}
    if bias and f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _norm(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def _lin(sd, p, bias=True):
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_emb_proj": _lin(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn_block(sd, p):
    """One BasicTransformerBlock (IP-Adapter K/V injected afterwards in
    checkpoint-index order — see :func:`_inject_ip_adapter`)."""
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "attn1": {
            "to_q": _lin(sd, f"{p}.attn1.to_q", bias=False),
            "to_k": _lin(sd, f"{p}.attn1.to_k", bias=False),
            "to_v": _lin(sd, f"{p}.attn1.to_v", bias=False),
            "to_out": _lin(sd, f"{p}.attn1.to_out.0"),
        },
        "norm2": _norm(sd, f"{p}.norm2"),
        "attn2": {
            "to_q": _lin(sd, f"{p}.attn2.to_q", bias=False),
            "to_k": _lin(sd, f"{p}.attn2.to_k", bias=False),
            "to_v": _lin(sd, f"{p}.attn2.to_v", bias=False),
            "to_out": _lin(sd, f"{p}.attn2.to_out.0"),
        },
        "norm3": _norm(sd, f"{p}.norm3"),
        "ff": {
            "proj_in": _lin(sd, f"{p}.ff.net.0.proj"),
            "proj_out": _lin(sd, f"{p}.ff.net.2"),
        },
    }
    return out


def _spatial_transformer(sd, p, n_layers):
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _lin(sd, f"{p}.proj_in"),
        "proj_out": _lin(sd, f"{p}.proj_out"),
    }
    for k in range(n_layers):
        out[f"block_{k}"] = _attn_block(sd, f"{p}.transformer_blocks.{k}")
    return out


def _iter_attn2(params: dict, cfg: SDXLUNetConfig):
    """Yield every cross-attention ("attn2") param dict in the order
    diffusers' ``unet.attn_processors`` enumerates — down_blocks, up_blocks,
    then mid_block (module REGISTRATION order: both block ModuleLists are
    created before ``mid_block`` is assigned). The IP-Adapter checkpoint's
    sequential indices follow this order, NOT spatial traversal order."""
    n_stages = len(cfg.block_out_channels)
    for i in range(n_stages):
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block):
            for k in range(depth):
                yield params[f"down_{i}_attn_{j}"][f"block_{k}"]["attn2"]
    for idx, i in enumerate(reversed(range(n_stages))):
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block + 1):
            for k in range(depth):
                yield params[f"up_{idx}_attn_{j}"][f"block_{k}"]["attn2"]
    for k in range(cfg.transformer_layers_per_block[-1]):
        yield params["mid_attn"][f"block_{k}"]["attn2"]


def _inject_ip_adapter(params: dict, cfg: SDXLUNetConfig, ip_sd: dict) -> None:
    """Install ``ip_adapter.{idx}.to_{k,v}_ip`` weights (sorted by the
    checkpoint's numeric index — odd 1,3,…,139 in the real sdxl_vit-h file,
    since attn1 processors are param-free ModuleList slots) into the attn2
    blocks, and the ``image_proj`` head at the tree root."""
    idxs = sorted({
        int(k.split(".")[1]) for k in ip_sd if k.startswith("ip_adapter.")
    })
    blocks = list(_iter_attn2(params, cfg))
    if len(idxs) != len(blocks):
        raise ValueError(
            f"IP-Adapter checkpoint has {len(idxs)} cross-attn entries but "
            f"the UNet config defines {len(blocks)} cross-attentions"
        )
    for i, blk in zip(idxs, blocks):
        k_ip = _t(ip_sd[f"ip_adapter.{i}.to_k_ip.weight"])
        v_ip = _t(ip_sd[f"ip_adapter.{i}.to_v_ip.weight"])
        want = blk["to_k"]["kernel"].shape
        if k_ip.shape != want or v_ip.shape != want:
            raise ValueError(
                f"IP-Adapter entry {i}: K/V shape {k_ip.shape} does not "
                f"match its cross-attention {want} — checkpoint/config "
                f"enumeration-order mismatch"
            )
        blk["ip_to_k"] = {"kernel": k_ip}
        blk["ip_to_v"] = {"kernel": v_ip}
    # image projection head: Linear (embed → tokens·dim) + LayerNorm
    params["ip_image_proj"] = {
        "kernel": _t(ip_sd["image_proj.proj.weight"]),
        "bias": np.asarray(ip_sd["image_proj.proj.bias"]),
    }
    params["ip_norm"] = {
        "scale": np.asarray(ip_sd["image_proj.norm.weight"]),
        "bias": np.asarray(ip_sd["image_proj.norm.bias"]),
    }


def convert_sdxl_unet(
    sd: dict,
    cfg: SDXLUNetConfig = SDXLUNetConfig(),
    ip_adapter_sd: dict | None = None,
) -> dict:
    """UNet2DConditionModel state dict (+ optional IP-Adapter dict with
    ``image_proj.*`` and ``ip_adapter.{idx}.to_{k,v}_ip.weight``, the real
    checkpoint's odd ModuleList indices) → flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embed_1": _lin(sd, "time_embedding.linear_1"),
        "time_embed_2": _lin(sd, "time_embedding.linear_2"),
        "add_embed_1": _lin(sd, "add_embedding.linear_1"),
        "add_embed_2": _lin(sd, "add_embedding.linear_2"),
        "norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }

    n_stages = len(cfg.block_out_channels)
    for i in range(n_stages):
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if depth > 0:
                params[f"down_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", depth)
        if i < n_stages - 1:
            params[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv")

    mid_depth = cfg.transformer_layers_per_block[-1]
    params["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    if mid_depth > 0:
        params["mid_attn"] = _spatial_transformer(
            sd, "mid_block.attentions.0", mid_depth)
    params["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")

    for idx, i in enumerate(reversed(range(n_stages))):
        depth = cfg.transformer_layers_per_block[i]
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{idx}_res_{j}"] = _resnet(
                sd, f"up_blocks.{idx}.resnets.{j}")
            if depth > 0:
                params[f"up_{idx}_attn_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{idx}.attentions.{j}", depth)
        if i > 0:
            params[f"up_{idx}_upsample"] = _conv(
                sd, f"up_blocks.{idx}.upsamplers.0.conv")

    if ip_adapter_sd is not None:
        _inject_ip_adapter(
            params, cfg, {k: np.asarray(v) for k, v in ip_adapter_sd.items()}
        )

    return params


def _vae_resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.group_norm"),
        "to_q": _lin(sd, f"{p}.to_q"),
        "to_k": _lin(sd, f"{p}.to_k"),
        "to_v": _lin(sd, f"{p}.to_v"),
        "to_out": _lin(sd, f"{p}.to_out.0"),
    }


def convert_sdxl_vae(sd: dict, cfg: VAEConfig = VAEConfig()) -> dict:
    """AutoencoderKL state dict → flax VAE params (encoder + decoder +
    quant convs)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n = len(cfg.block_out_channels)
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "norm_out": _norm(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    enc["mid_res_0"] = _vae_resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_res_1"] = _vae_resnet(sd, "encoder.mid_block.resnets.1")
    if cfg.use_mid_attention:
        enc["mid_attn"] = _vae_attn(sd, "encoder.mid_block.attentions.0")

    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "norm_out": _norm(sd, "decoder.conv_norm_out"),
                 "conv_out": _conv(sd, "decoder.conv_out")}
    dec["mid_res_0"] = _vae_resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_res_1"] = _vae_resnet(sd, "decoder.mid_block.resnets.1")
    if cfg.use_mid_attention:
        dec["mid_attn"] = _vae_attn(sd, "decoder.mid_block.attentions.0")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
