"""SDXL-style generator tests (tiny configs): UNet/VAE shapes, IP-Adapter
conditioning, Euler-ancestral schedule, turbo 4-step sampling, img2img."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.gen.sdxl import (
    Generator4Embeds,
    GeneratorConfig,
    encode_init_image,
)
from eeg_image_decode_tpu.gen.unet import SDXLUNet, SDXLUNetConfig
from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig
from eeg_image_decode_tpu.ops.euler import EulerDiscreteSchedule


def _tiny_unet():
    cfg = SDXLUNetConfig.tiny()
    model = SDXLUNet(cfg, dtype=jnp.float32)
    lat = jnp.zeros((2, 8, 8, 4))
    t = jnp.asarray([1, 500])
    ctx = jnp.zeros((2, 4, cfg.cross_attention_dim))
    emb = jnp.ones((2, cfg.ip_image_embed_dim))
    params = model.init(jax.random.key(0), lat, t, ctx, None, None, emb)
    return cfg, model, params, (lat, t, ctx, emb)


def test_unet_shapes_and_image_embed_conditioning(rng):
    cfg, model, params, (lat, t, ctx, emb) = _tiny_unet()
    lat = jnp.asarray(rng.normal(size=lat.shape).astype(np.float32))
    out = model.apply(params, lat, t, ctx, None, None, emb)
    assert out.shape == lat.shape and out.dtype == jnp.float32
    # IP-Adapter: different image embeds must change the prediction
    emb2 = jnp.asarray(rng.normal(size=emb.shape).astype(np.float32))
    out2 = model.apply(params, lat, t, ctx, None, None, emb2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # no image embeds at all also works (pure text path)
    out3 = model.apply(params, lat, t, ctx, None, None, None)
    assert out3.shape == lat.shape


def test_unet_timestep_conditioning(rng):
    cfg, model, params, (lat, t, ctx, emb) = _tiny_unet()
    lat = jnp.asarray(rng.normal(size=lat.shape).astype(np.float32))
    a = model.apply(params, lat, jnp.asarray([1, 1]), ctx, None, None, emb)
    b = model.apply(params, lat, jnp.asarray([900, 900]), ctx, None, None, emb)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig.tiny()
    vae = VAE(cfg, dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params = vae.init(jax.random.key(0), img)
    lat = vae.apply(params, img, method=VAE.encode)
    assert lat.shape == (2, 8, 8, 4)  # one downsample stage in tiny config
    rec = vae.apply(params, lat, method=VAE.decode)
    assert rec.shape == img.shape


def test_euler_schedule_trailing_spacing():
    s = EulerDiscreteSchedule()
    ts, sigmas = s.timesteps_and_sigmas(4)
    assert np.asarray(ts).tolist() == [999, 749, 499, 249]
    assert sigmas.shape == (5,)
    assert float(sigmas[-1]) == 0.0
    assert np.all(np.diff(np.asarray(sigmas)) < 0)  # strictly decreasing


def test_euler_img2img_strength_truncates():
    s = EulerDiscreteSchedule()
    ts_full, sig_full = s.timesteps_and_sigmas(4)
    ts_half, sig_half = s.timesteps_and_sigmas(4, strength=0.5)
    assert ts_half.shape == (2,)
    np.testing.assert_array_equal(np.asarray(ts_half), np.asarray(ts_full[-2:]))


def test_euler_step_deterministic_branch(rng):
    s = EulerDiscreteSchedule(ancestral=False)
    x = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    out = s.step(eps, jnp.asarray(2.0), jnp.asarray(1.0), x, jnp.zeros_like(x))
    # x0 = x - 2 eps; d = eps; x' = x + eps*(1-2) = x - eps
    np.testing.assert_allclose(np.asarray(out), np.asarray(x - eps), rtol=1e-5)


def test_generator_turbo_4step(rng):
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    emb = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    img = gen.generate(emb, key=jax.random.key(1))
    # tiny VAE has one downsample stage → 8×8 latents decode to 16×16 px
    assert img.shape == (2, 16, 16, 3)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0
    # reproducible under the same key, different under another
    img_b = gen.generate(emb, key=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_b), atol=1e-5)
    # embedding must influence the image (IP-Adapter path live). NB: the IP
    # projection ends in LayerNorm, so a scalar multiple of the embedding is
    # (correctly) nearly invariant — probe with a different embedding.
    emb_c = jnp.asarray(rng.normal(size=emb.shape).astype(np.float32))
    img_c = gen.generate(emb_c, key=jax.random.key(1))
    assert not np.allclose(np.asarray(img), np.asarray(img_c), atol=1e-4)


def test_generator_cfg_with_zero_negative(rng):
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    emb = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    a = gen.generate(emb, key=jax.random.key(2), guidance_scale=0.0)
    b = gen.generate(emb, key=jax.random.key(2), guidance_scale=3.0)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_generator_img2img_low_level(rng):
    """Low-level pipeline: init latents + strength<1 keep the output closer to
    the init than a fresh-noise run (the reference's structural conditioning)."""
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    params = gen.init(jax.random.key(0))
    emb = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    init_img = jnp.asarray(
        rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32)
    )
    init_lat = encode_init_image(gen, params, init_img)
    assert init_lat.shape == (1, 8, 8, 4)

    lat_i2i = gen.generate(
        emb, key=jax.random.key(3), init_latents=init_lat,
        img2img_strength=0.5, decode=False,
    )
    lat_free = gen.generate(emb, key=jax.random.key(3), decode=False)
    d_init = float(jnp.mean((lat_i2i - init_lat) ** 2))
    d_free = float(jnp.mean((lat_free - init_lat) ** 2))
    assert d_init < d_free, (d_init, d_free)
