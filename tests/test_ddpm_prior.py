"""DDPM schedule golden tests + diffusion-prior integration.

Parity target (SURVEY.md §4): DDPM add_noise/step sequences against the
published DDPM equations (diffusers' DDPMScheduler defaults the reference
uses, re-derived independently in numpy here as the oracle)."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import PriorConfig
from eeg_image_decode_tpu.models.diffusion_prior import (
    DiffusionPriorMLP,
    DiffusionPriorUNet,
    timestep_embedding,
)
from eeg_image_decode_tpu.ops.ddpm import DDPMSchedule
from eeg_image_decode_tpu.train.prior import PriorPipe, expand_image_embeddings


def test_schedule_tables():
    s = DDPMSchedule()
    betas = np.asarray(s.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
    ac = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and ac[0] < 1.0 and ac[-1] > 0.0
    np.testing.assert_allclose(ac, np.cumprod(1 - betas), rtol=1e-5)


def test_add_noise_formula(rng):
    s = DDPMSchedule()
    x0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    t = jnp.asarray([0, 10, 500, 999])
    got = s.add_noise(x0, noise, t)
    ac = np.asarray(s.alphas_cumprod)[np.asarray(t)]
    want = (
        np.sqrt(ac)[:, None] * np.asarray(x0)
        + np.sqrt(1 - ac)[:, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_inference_timesteps_spacing():
    s = DDPMSchedule()
    ts = np.asarray(s.inference_timesteps(50))
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0
    assert np.all(np.diff(ts) == -20)


def test_step_mean_matches_numpy_oracle(rng):
    """One ancestral step vs the DDPM posterior mean equation."""
    s = DDPMSchedule(clip_sample=False)
    x_t = rng.normal(size=(2, 6)).astype(np.float32)
    eps = rng.normal(size=(2, 6)).astype(np.float32)
    t, ratio = 500, 20
    got = s.step(
        jnp.asarray(eps), jnp.asarray(t), jnp.asarray(x_t),
        jnp.zeros_like(jnp.asarray(x_t)), num_inference_steps=50,
    )
    ac = np.cumprod(1 - np.linspace(1e-4, 0.02, 1000))
    ac_t, ac_prev = ac[t], ac[t - ratio]
    cur_beta = 1 - ac_t / ac_prev
    x0 = (x_t - np.sqrt(1 - ac_t) * eps) / np.sqrt(ac_t)
    mean = (
        np.sqrt(ac_prev) * cur_beta / (1 - ac_t) * x0
        + np.sqrt(ac_t / ac_prev) * (1 - ac_prev) / (1 - ac_t) * x_t
    )
    np.testing.assert_allclose(np.asarray(got), mean, rtol=1e-4)


def test_step_clip_sample_active(rng):
    """clip_sample=True (the diffusers default the reference inherits) clamps
    the implied x0 — large-ε steps must differ from the unclipped result."""
    s_clip = DDPMSchedule(clip_sample=True)
    s_free = DDPMSchedule(clip_sample=False)
    x_t = jnp.asarray(5 * rng.normal(size=(2, 6)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    z = jnp.zeros_like(x_t)
    a = s_clip.step(eps, jnp.asarray(900), x_t, z, num_inference_steps=50)
    b = s_free.step(eps, jnp.asarray(900), x_t, z, num_inference_steps=50)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_timestep_embedding_structure():
    emb = timestep_embedding(jnp.asarray([0, 7]), 16)
    assert emb.shape == (2, 16)
    # t=0 → cos half = 1, sin half = 0 (diffusers flip_sin_to_cos layout)
    np.testing.assert_allclose(np.asarray(emb[0, :8]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 0.0, atol=1e-6)


def test_prior_unet_shapes_and_cond_mask(rng):
    model = DiffusionPriorUNet(
        embed_dim=32, cond_dim=32, hidden_dims=(32, 16, 8), time_embed_dim=16
    )
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    t = jnp.asarray([0, 10, 100, 999])
    c = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    v = model.init(jax.random.key(0), x, t, c, jnp.ones(4))
    out = model.apply(v, x, t, c, jnp.ones(4))
    assert out.shape == (4, 32)
    # mask=0 ≡ cond=None (bias included)
    masked = model.apply(v, x, t, c, jnp.zeros(4))
    uncond = model.apply(v, x, t, None)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(uncond), atol=1e-6)
    assert not np.allclose(np.asarray(out), np.asarray(masked))


def test_prior_mlp_variant(rng):
    model = DiffusionPriorMLP(embed_dim=16, cond_dim=16, hidden_dim=32,
                              layers_per_block=2, time_embed_dim=8)
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    t = jnp.asarray([5, 50])
    c = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    v = model.init(jax.random.key(0), x, t, c)
    assert model.apply(v, x, t, c).shape == (2, 16)


def test_expand_image_embeddings():
    emb = np.arange(6, dtype=np.float32).reshape(3, 2)[:, None, :].repeat(1, 1)
    emb = np.arange(8, dtype=np.float32).reshape(4, 2)  # 2 cls × 2 ipc
    out = expand_image_embeddings(emb, n_classes=2, images_per_class=2, reps=3)
    assert out.shape == (12, 2)
    np.testing.assert_array_equal(out[0], out[1])  # reps share the embedding
    np.testing.assert_array_equal(out[0], emb[0])
    np.testing.assert_array_equal(out[3], emb[1])


def test_prior_end_to_end_learns_conditional_mapping(rng):
    """Train a small prior to map distinct conditions to distinct targets;
    CFG sampling must land near the right target (cosine similarity)."""
    n_cls, d = 4, 16
    conds = np.eye(n_cls, d, dtype=np.float32)
    targets = 0.5 * np.asarray(
        np.random.default_rng(0).normal(size=(n_cls, d)), np.float32
    )
    targets /= np.abs(targets).max()  # keep inside clip_sample range
    c_train = np.repeat(conds, 64, axis=0)
    h_train = np.repeat(targets, 64, axis=0)

    cfg = PriorConfig(
        embed_dim=d, cond_dim=d, hidden_dims=(64, 32), time_embed_dim=16,
        batch_size=64, epochs=250, lr=3e-3, warmup_steps=50,
        num_inference_steps=25, guidance_scale=2.0, seed=0,
    )
    pipe = PriorPipe(cfg)
    history = pipe.train(c_train, h_train, log_fn=None)
    assert history[-1]["loss"] < history[0]["loss"]

    samples = np.asarray(pipe.generate(jnp.asarray(conds), key=jax.random.key(1)))
    sims = np.einsum("nd,md->nm", samples, targets) / (
        np.linalg.norm(samples, axis=1, keepdims=True)
        * np.linalg.norm(targets, axis=1, keepdims=True).T
        + 1e-9
    )
    # each sample most similar to its own target
    assert (np.argmax(sims, axis=1) == np.arange(n_cls)).mean() >= 0.75, sims


def test_prior_training_mesh_matches_single_device(rng, mesh8):
    """dp-sharded prior training (batch indices sharded, GSPMD grad
    all-reduce) must produce the same state as single-device training."""
    n, d = 128, 8
    c = rng.normal(size=(n, d)).astype(np.float32)
    h = rng.normal(size=(n, d)).astype(np.float32)
    cfg = PriorConfig(
        embed_dim=d, cond_dim=d, hidden_dims=(32, 16), time_embed_dim=8,
        batch_size=32, epochs=3, lr=1e-3, warmup_steps=5, seed=1,
    )
    single = PriorPipe(cfg)
    hist_s = single.train(c, h, log_fn=None)
    sharded = PriorPipe(cfg, mesh=mesh8)
    hist_m = sharded.train(c, h, log_fn=None)
    np.testing.assert_allclose(
        hist_m[-1]["loss"], hist_s[-1]["loss"], rtol=2e-4, atol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(single.state.params),
        jax.tree_util.tree_leaves(sharded.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
