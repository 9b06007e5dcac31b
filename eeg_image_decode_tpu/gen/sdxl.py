"""Image generation from CLIP embeddings — the ``Generator4Embeds`` rebuild.

Reference flow (``Generation/custom_pipeline.py``): SDXL-turbo + IP-Adapter
``ip-adapter_sdxl_vit-h`` at scale 1.0, guidance 0.0, 4 Euler-ancestral steps;
the pipeline is monkey-patched to take the (EEG-predicted) CLIP image
embedding directly, with CFG negatives = zeros (``:319-324,456-492``). The
low-level variant (``custom_pipeline_low_level.py``) seeds the latents from a
VAE-encoded init image at an img2img strength instead of pure noise.

Here the whole denoise loop is one jitted ``lax.scan`` over the σ ladder and
the VAE decode is fused into the same jit — on TPU the 4-step turbo pass is a
single dispatch. Weights: random init for tests; real SDXL-turbo weights load
through ``gen/convert.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig
from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig
from eeg_image_decode_tpu.ops.ddpm import row_noise
from eeg_image_decode_tpu.ops.euler import EulerDiscreteSchedule


@dataclass(frozen=True)
class GeneratorConfig:
    unet: SDXLUNetConfig = field(default_factory=SDXLUNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    num_inference_steps: int = 4
    guidance_scale: float = 0.0
    #: latent spatial size; SDXL-turbo at 512px → 64×64 latents
    latent_size: tuple[int, int] = (64, 64)
    #: text context length (77 per CLIP tokenizer; zeros for '' prompts)
    text_len: int = 77

    @property
    def pixel_factor(self) -> int:
        """latent→pixel upsampling of the VAE (SDXL: 8×)."""
        return 2 ** (len(self.vae.block_out_channels) - 1)

    @staticmethod
    def tiny() -> "GeneratorConfig":
        return GeneratorConfig(
            unet=SDXLUNetConfig.tiny(),
            vae=VAEConfig.tiny(),
            latent_size=(8, 8),
            text_len=4,
        )


class Generator4Embeds:
    """generate(image_embeds) → images in [0, 1] (ref ``:456-492``)."""

    def __init__(self, config: GeneratorConfig = GeneratorConfig(), *,
                 dtype=jnp.bfloat16):
        self.config = config
        self.unet = SDXLUNet(config.unet, dtype=dtype)
        self.vae = VAE(config.vae, dtype=dtype)
        self.schedule = EulerDiscreteSchedule(ancestral=True)
        self.params: dict | None = None
        #: default (context, pooled) used when generate() gets no text args —
        #: the encoded '' prompt (ref ``custom_pipeline.py:239``), set via
        #: set_default_text_conditioning(). Zeros otherwise (random-weight
        #: smoke runs only; real-weight parity requires the encoded '').
        self._default_text: tuple[jax.Array, jax.Array | None] | None = None

    # — parameters —
    def init(self, key: jax.Array | None = None) -> dict:
        cfg = self.config
        key = key if key is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        h, w = cfg.latent_size
        latents = jnp.zeros((1, h, w, cfg.unet.in_channels))
        ctx = jnp.zeros((1, cfg.text_len, cfg.unet.cross_attention_dim))
        emb = jnp.zeros((1, cfg.unet.ip_image_embed_dim))
        unet_params = self.unet.init(
            k1, latents, jnp.zeros((1,), jnp.int32), ctx, None, None, emb
        )["params"]
        f = cfg.pixel_factor
        img = jnp.zeros((1, h * f, w * f, cfg.vae.in_channels))
        vae_params = self.vae.init(k2, img)["params"]
        self.params = {"unet": unet_params, "vae": vae_params}
        return self.params

    def init_abstract(self, key: jax.Array | None = None,
                      dtype=jnp.bfloat16) -> dict:
        """Materialize randomly-filled params directly in ``dtype`` without
        ever building the fp32 tree (full SDXL fp32 init would need >10 GB of
        HBM; bf16 halves it). Values are N(0, 0.02) — for latency/memory work
        and as the target structure for weight conversion."""
        cfg = self.config
        key = key if key is not None else jax.random.key(0)
        h, w = cfg.latent_size
        f = cfg.pixel_factor

        def abstract():
            k1, k2 = jax.random.split(jax.random.key(0))
            latents = jnp.zeros((1, h, w, cfg.unet.in_channels))
            ctx = jnp.zeros((1, cfg.text_len, cfg.unet.cross_attention_dim))
            emb = jnp.zeros((1, cfg.unet.ip_image_embed_dim))
            up = self.unet.init(k1, latents, jnp.zeros((1,), jnp.int32), ctx,
                                None, None, emb)["params"]
            vp = self.vae.init(
                k2, jnp.zeros((1, h * f, w * f, cfg.vae.in_channels))
            )["params"]
            return {"unet": up, "vae": vp}

        shapes = jax.eval_shape(abstract)
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))

        @jax.jit
        def fill(keys):
            return treedef.unflatten([
                0.02 * jax.random.normal(k, s.shape, dtype)
                for k, s in zip(keys, leaves)
            ])

        self.params = fill(keys)
        return self.params

    def load_params(self, params: dict) -> None:
        self.params = params

    def set_default_text_conditioning(
        self, text_context: jax.Array, pooled_text_embed: jax.Array | None = None
    ) -> None:
        """Install the '' -prompt embeddings as the default conditioning.

        ``text_context`` (1, L, ctx_dim) / ``pooled_text_embed`` (1, pooled)
        are broadcast over the batch at generate() time. Compute them once
        with :class:`~eeg_image_decode_tpu.gen.text_encoder.SDXLTextEncoder`:

            ctx, pooled = encoder.encode(params, [""], tok1, tok2)
            gen.set_default_text_conditioning(ctx, pooled)
        """
        ctx = jnp.asarray(text_context)
        if ctx.ndim == 2:
            ctx = ctx[None]
        pooled = None if pooled_text_embed is None else jnp.asarray(
            pooled_text_embed
        ).reshape(1, -1)
        self._default_text = (ctx, pooled)

    # — sampling —
    def generate(
        self,
        image_embeds: jax.Array,
        *,
        key: jax.Array | None = None,
        text_context: jax.Array | None = None,
        pooled_text_embed: jax.Array | None = None,
        num_inference_steps: int | None = None,
        guidance_scale: float | None = None,
        init_latents: jax.Array | None = None,
        img2img_strength: float = 1.0,
        decode: bool = True,
        row_keys: jax.Array | None = None,
    ) -> jax.Array:
        """CLIP image embeddings (B, D) → images (B, H, W, 3) in [0, 1].

        ``init_latents`` + ``img2img_strength`` < 1 enable the low-level
        pipeline: denoising starts from the noised init latents at the
        intermediate σ (ref ``prepare_latents_img2img``).

        ``row_keys`` (B,) typed PRNG keys make each row's noise independent
        of batch composition (see ``ops/ddpm.py::make_cfg_sampler``); when
        given, ``key`` is ignored."""
        assert self.params is not None, "call init() or load_params() first"
        cfg = self.config
        steps = num_inference_steps or cfg.num_inference_steps
        scale = (
            cfg.guidance_scale if guidance_scale is None else guidance_scale
        )
        key = key if key is not None else jax.random.key(0)
        b = image_embeds.shape[0]
        if text_context is None:
            if self._default_text is not None:
                ctx0, pooled0 = self._default_text
                text_context = jnp.broadcast_to(
                    ctx0, (b, *ctx0.shape[1:])
                )
                if pooled_text_embed is None and pooled0 is not None:
                    pooled_text_embed = jnp.broadcast_to(
                        pooled0, (b, pooled0.shape[-1])
                    )
            else:
                text_context = jnp.zeros(
                    (b, cfg.text_len, cfg.unet.cross_attention_dim)
                )
        strength = img2img_strength if init_latents is not None else 1.0
        return _generate_jit(
            self,
            steps,
            float(scale),
            strength if init_latents is not None else None,
            decode,
            self.params,
            jnp.asarray(image_embeds, jnp.float32),
            text_context,
            pooled_text_embed,
            init_latents,
            key,
            row_keys,
        )


@partial(
    jax.jit,
    static_argnums=(0, 1, 2, 3, 4),
)
def _generate_jit(
    gen: Generator4Embeds,
    steps: int,
    guidance_scale: float,
    strength: float | None,
    decode: bool,
    params: dict,
    image_embeds: jax.Array,
    text_context: jax.Array,
    pooled_text_embed: jax.Array | None,
    init_latents: jax.Array | None,
    key: jax.Array,
    row_keys: jax.Array | None = None,
):
    cfg = gen.config
    sched = gen.schedule
    ts, sigmas = sched.timesteps_and_sigmas(
        steps, strength=1.0 if strength is None else strength
    )
    b = image_embeds.shape[0]
    h, w = cfg.latent_size
    shape = (b, h, w, cfg.unet.in_channels)

    # per-ROW draws (ops/ddpm.py::row_noise, fold_in by step): a row's noise
    # is the same whatever batch it rides in — required by the serving
    # coalescer's determinism contract (server.py::_Coalescer)
    key, init_key = jax.random.split(key)
    noise = (row_noise(row_keys, 0, shape[1:]) if row_keys is not None
             else jax.random.normal(init_key, shape, jnp.float32))
    if init_latents is None:
        x = noise * sched.init_noise_sigma(sigmas)
    else:
        x = sched.add_noise(init_latents.astype(jnp.float32), noise, sigmas[0])

    # SDXL micro-conditioning time_ids: (orig_h, orig_w, crop_t, crop_l, h, w)
    px_h, px_w = h * cfg.pixel_factor, w * cfg.pixel_factor
    time_ids = jnp.tile(
        jnp.asarray([[px_h, px_w, 0, 0, px_h, px_w]], jnp.float32), (b, 1)
    )

    use_cfg = guidance_scale > 0
    if use_cfg:
        # negative branch: zero image embeds (ref :319-324), zero text
        embeds2 = jnp.concatenate(
            [image_embeds, jnp.zeros_like(image_embeds)], axis=0
        )
        ctx2 = jnp.concatenate([text_context, jnp.zeros_like(text_context)], 0)
        tids2 = jnp.concatenate([time_ids, time_ids], 0)
        pooled2 = (
            jnp.concatenate([pooled_text_embed, jnp.zeros_like(pooled_text_embed)], 0)
            if pooled_text_embed is not None
            else None
        )

    def unet_eps(x_in, t, ctx, pooled, tids, embeds):
        return gen.unet.apply(
            {"params": params["unet"]}, x_in, t, ctx, pooled, tids, embeds
        )

    def body(carry, inputs):
        x, key = carry
        t, sigma, sigma_next, step_i = inputs
        key, nkey = jax.random.split(key)
        scaled = sched.scale_model_input(x, sigma)
        if use_cfg:
            x2 = jnp.concatenate([scaled, scaled], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.int32)
            eps2 = unet_eps(x2, t2, ctx2, pooled2, tids2, embeds2)
            eps_c, eps_u = eps2[:b], eps2[b:]
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            tb = jnp.full((b,), t, jnp.int32)
            eps = unet_eps(scaled, tb, text_context, pooled_text_embed,
                           time_ids, image_embeds)
        step_noise = (row_noise(row_keys, step_i + 1, shape[1:])
                      if row_keys is not None
                      else jax.random.normal(nkey, x.shape, jnp.float32))
        x = sched.step(eps, sigma, sigma_next, x, step_noise)
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        body, (x, key),
        (ts, sigmas[:-1], sigmas[1:],
         jnp.arange(ts.shape[0], dtype=jnp.int32)),
    )
    if not decode:
        return x
    img = gen.vae.apply({"params": params["vae"]}, x, method=VAE.decode)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


def encode_init_image(gen: Generator4Embeds, params: dict, images: jax.Array,
                      key: jax.Array | None = None) -> jax.Array:
    """Pixels in [0,1] → scaled latents for the img2img low-level path."""
    x = images * 2.0 - 1.0
    return gen.vae.apply(
        {"params": params["vae"]}, x, key, method=VAE.encode
    )
