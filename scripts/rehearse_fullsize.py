"""On-chip full-size converted-checkpoint rehearsal (bf16, one v5e).

Companion to ``tests/test_convert_fullsize.py`` (which validates grammar +
shapes on CPU): synthesize every real checkpoint at full shapes, run it
through its converter on the HOST, push the converted tree to the chip in
bf16, and execute the forward — proving the exact arrays a real-weight user
would load flow through device_put + jit at scale. Results are recorded in
docs/PERF.md.

Legs (run sequentially, freeing HBM between):
  1. sdxl-turbo UNet (2.57B params) + 70-entry IP-Adapter — ε forward at
     64×64 latents / 77-token context
  2. SDXL VAE — 64×64 latent → 512×512 decode
  3. dual SDXL text encoders (CLIP-L 12L + bigG 32L) — 77-token encode
  4. OpenCLIP ViT-H/14 vision (32L) — 224² batch-8 encode + text tower
  5. git-large-coco decoder — 257-token grid, 10-step greedy decode

Run: python scripts/rehearse_fullsize.py   (needs the TPU; ~10 GB of host→
device transfer rides the dev-harness tunnel, so expect a few minutes of
transfer on this machine)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import ml_dtypes

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_convert_fullsize import (  # noqa: E402
    _hf_text_cfg,
    ip_adapter_spec,
    openclip_spec,
    unet_checkpoint_spec,
    vae_checkpoint_spec,
)

from eeg_image_decode_tpu.gen.convert import (  # noqa: E402
    convert_sdxl_unet,
    convert_sdxl_vae,
)
from eeg_image_decode_tpu.gen.text_encoder import (  # noqa: E402
    SDXLTextEncoder,
    SDXLTextEncoderConfig,
    convert_sdxl_text_encoders,
)
from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig  # noqa: E402
from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig  # noqa: E402
from eeg_image_decode_tpu.models.clip_vit import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
)
from eeg_image_decode_tpu.models.git_caption import (  # noqa: E402
    GITCaptioner,
    GITConfig,
    convert_git_causal_lm,
)
from eeg_image_decode_tpu.utils.convert_clip import (  # noqa: E402
    convert_openclip_text,
    convert_openclip_vision,
)

BF16 = ml_dtypes.bfloat16
RESULTS: list[str] = []


def synth(spec: dict, seed: int, dtype=BF16) -> dict:
    """Checkpoint-shaped N(0, 0.02) tensors (norm scales at 1 so converted
    activations keep sane magnitudes through 32-layer stacks)."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, s in spec.items():
        n = int(np.prod(s, dtype=np.int64))
        a = rng.standard_normal(n, dtype=np.float32) * 0.02
        if ("norm" in k and k.endswith(".weight")) or k.endswith("ln_1.weight"):
            a = np.ones(n, np.float32)
        out[k] = a.astype(dtype).reshape(s)
    return out


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a).astype(BF16), tree
    )


def n_params(tree) -> float:
    return sum(np.prod(v.shape, dtype=np.int64)
               for v in jax.tree_util.tree_leaves(tree)) / 1e9


def _sync(out):
    """Force completion with a HOST READBACK of the first output leaf.

    ``jax.block_until_ready`` is not a reliable sync on this machine's
    remote-device runtime (with several dispatches in flight it can return
    before the queued work finishes — measured in round 3: 10 queued
    full-size UNet forwards "done" in 16 ms wall vs 168 ms traced device
    time). A readback cannot lie. Wall numbers here therefore include one
    ~25 ms host↔device round trip on this harness — per-op device time
    comes from the xplane traces (docs/PERF.md), not from these lines.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf), np.float32)


def timed(label, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    flat = _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        flat = _sync(fn(*args))
    steady = (time.perf_counter() - t0) / iters
    assert np.all(np.isfinite(flat)), f"{label}: non-finite output"
    line = (f"{label}: compile {compile_s:.1f}s, steady {steady * 1e3:.1f} ms"
            f" wall (incl. ~25 ms harness dispatch), finite ✓")
    print(line, flush=True)
    RESULTS.append(line)
    return out


def leg_unet():
    cfg = SDXLUNetConfig.sdxl_turbo()
    print("— leg 1: sdxl-turbo UNet + IP-Adapter —", flush=True)
    t0 = time.perf_counter()
    params = convert_sdxl_unet(
        synth(unet_checkpoint_spec(cfg), 0), cfg,
        ip_adapter_sd=synth(ip_adapter_spec(cfg), 1),
    )
    conv_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = jax.device_put(params)
    jax.block_until_ready(dev)
    put_s = time.perf_counter() - t0
    line = (f"unet convert {conv_s:.1f}s host, device_put "
            f"{put_s:.1f}s ({n_params(params):.2f}B params bf16)")
    print(line, flush=True)
    RESULTS.append(line)
    del params

    model = SDXLUNet(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def fwd(p, lat, t, ctx, pooled, tids, emb):
        return model.apply({"params": p}, lat, t, ctx, pooled, tids, emb)

    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.normal(size=(1, 64, 64, 4)), jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(1, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(1, 1280)) * 0.1, jnp.bfloat16)
    tids = jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 1024)), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    timed("unet eps fwd (1,64,64,4)", fwd, dev, lat, t, ctx, pooled, tids, emb)
    del dev


def leg_vae():
    cfg = VAEConfig.sdxl()
    print("— leg 2: SDXL VAE —", flush=True)
    params = convert_sdxl_vae(synth(vae_checkpoint_spec(cfg), 3), cfg)
    dev = jax.device_put(params)
    model = VAE(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def dec(p, z):
        return model.apply({"params": p}, z, method=VAE.decode)

    z = jnp.asarray(np.random.default_rng(4).normal(size=(1, 64, 64, 4)),
                    jnp.bfloat16)
    timed("vae decode 64→512", dec, dev, z)
    del dev


def leg_text():
    import torch
    import transformers

    print("— leg 3: dual SDXL text encoders —", flush=True)
    cfg = SDXLTextEncoderConfig()
    with torch.device("meta"):
        te1 = transformers.CLIPTextModel(_hf_text_cfg(cfg.clip_l, False))
        te2 = transformers.CLIPTextModelWithProjection(
            _hf_text_cfg(cfg.big_g, True))
    spec1 = {k: tuple(v.shape) for k, v in te1.state_dict().items()
             if not k.endswith("position_ids")}
    spec2 = {k: tuple(v.shape) for k, v in te2.state_dict().items()
             if not k.endswith("position_ids")}
    params = to_bf16(convert_sdxl_text_encoders(
        synth(spec1, 5, np.float16), synth(spec2, 6, np.float16), cfg))
    enc = SDXLTextEncoder(cfg, dtype=jnp.bfloat16)
    dev = jax.device_put(params)
    ids1 = jnp.zeros((2, 77), jnp.int32)
    ids2 = jnp.zeros((2, 77), jnp.int32)
    timed("dual text encode (2,77)", enc.encode_tokens, dev, ids1, ids2)
    del dev


def leg_openclip():
    print("— leg 4: OpenCLIP ViT-H/14 —", flush=True)
    vcfg = CLIPVisionConfig.vit_h_14()
    tcfg = CLIPTextConfig.vit_h_14()
    sd = synth(openclip_spec(vcfg, tcfg), 7)
    vis = jax.device_put(convert_openclip_vision(sd, vcfg))
    txt = jax.device_put(convert_openclip_text(sd, tcfg))
    del sd
    vision = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    text = CLIPTextTower(tcfg, dtype=jnp.bfloat16)

    @jax.jit
    def vfwd(p, x):
        return vision.apply({"params": p}, x)

    @jax.jit
    def tfwd(p, ids):
        return text.apply({"params": p}, ids)

    imgs = jnp.asarray(
        np.random.default_rng(8).normal(size=(8, 224, 224, 3)), jnp.bfloat16)
    timed("vit-h vision encode (8,224,224,3)", vfwd, vis, imgs)
    timed("vit-h text encode (2,77)", tfwd, txt,
          jnp.zeros((2, 77), jnp.int32))
    del vis, txt


def leg_git():
    import torch
    import transformers

    print("— leg 5: git-large-coco decoder —", flush=True)
    cfg = GITConfig.git_large_coco()
    vis_cfg = CLIPVisionConfig.git_vit_l_14()
    hf_cfg = transformers.GitConfig(
        vision_config=transformers.GitVisionConfig(
            hidden_size=vis_cfg.width, intermediate_size=4 * vis_cfg.width,
            num_hidden_layers=vis_cfg.layers,
            num_attention_heads=vis_cfg.heads,
            patch_size=vis_cfg.patch_size, image_size=vis_cfg.image_size,
        ).to_dict(),
        vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    with torch.device("meta"):
        git = transformers.GitForCausalLM(hf_cfg)
    dec_spec = {k: tuple(v.shape) for k, v in git.state_dict().items()
                if not (k.startswith("git.image_encoder.")
                        or k.endswith("position_ids"))}
    params = to_bf16(convert_git_causal_lm(synth(dec_spec, 9, np.float16), cfg))
    dev = jax.device_put(params)
    model = GITCaptioner(cfg, dtype=jnp.bfloat16)
    grids = jnp.asarray(
        np.random.default_rng(10).normal(size=(2, 257, 1024)), jnp.bfloat16)

    def gen(p, g):
        return model.generate({"params": p}, g, max_new_tokens=10)

    timed("git greedy decode 10 tok (B=2)", gen, dev, grids, iters=2)
    del dev


def main():
    import sys

    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    legs = {"unet": leg_unet, "vae": leg_vae, "text": leg_text,
            "openclip": leg_openclip, "git": leg_git}
    picked = [legs[a] for a in sys.argv[1:]] or list(legs.values())
    print("devices:", wait_for_backend(), flush=True)
    for leg in picked:
        leg()
    print("\n=== rehearsal summary ===")
    for line in RESULTS:
        print(line)


if __name__ == "__main__":
    main()
