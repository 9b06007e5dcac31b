"""GIT-style captioner tests: shapes, causal masking, greedy decode, and the
PixelProjector adapter + its MSE training objective."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from eeg_image_decode_tpu.models.git_caption import (
    GITCaptioner,
    GITConfig,
    PixelProjector,
)


def _tiny():
    cfg = GITConfig.tiny()
    model = GITCaptioner(cfg)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(2, cfg.num_visual_tokens,
                                       cfg.visual_dim)).astype(np.float32))
    toks = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, 6)),
                       jnp.int32)
    variables = model.init(jax.random.key(0), vis, toks)
    return cfg, model, variables, vis, toks


def test_captioner_logit_shape():
    cfg, model, v, vis, toks = _tiny()
    logits = model.apply(v, vis, toks)
    assert logits.shape == (2, 6, cfg.vocab_size)


def test_causal_mask_blocks_future():
    """Changing token j must not change logits at positions < j."""
    cfg, model, v, vis, toks = _tiny()
    base = model.apply(v, vis, toks)
    toks2 = toks.at[:, 4].set((toks[:, 4] + 1) % cfg.vocab_size)
    pert = model.apply(v, vis, toks2)
    np.testing.assert_allclose(
        np.asarray(base[:, :4]), np.asarray(pert[:, :4]), atol=1e-5
    )
    assert not np.allclose(np.asarray(base[:, 4:]), np.asarray(pert[:, 4:]))


def test_visual_tokens_condition_all_positions():
    cfg, model, v, vis, toks = _tiny()
    base = model.apply(v, vis, toks)
    pert = model.apply(v, vis + 1.0, toks)
    assert not np.allclose(np.asarray(base), np.asarray(pert))


def test_greedy_generate():
    cfg, model, v, vis, _ = _tiny()
    out = model.generate(v, vis, max_new_tokens=5)
    assert out.shape == (2, 6)
    assert np.all(np.asarray(out[:, 0]) == cfg.bos_token_id)
    assert np.asarray(out).max() < cfg.vocab_size
    # deterministic
    out2 = model.generate(v, vis, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_pixel_projector_learns_mapping(rng):
    """Train the adapter with MSE exactly like image_adapter.ipynb cell 3:
    CLIP ViT-H embedding → GIT visual token grid."""
    proj = PixelProjector(num_tokens=5, out_dim=8)
    x = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    w_true = jnp.asarray(rng.normal(size=(16, 5 * 8)).astype(np.float32))
    target = (x @ w_true).reshape(32, 5, 8)
    target = (target - target.mean()) / target.std()

    params = proj.init(jax.random.key(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return jnp.mean((proj.apply(p, x) - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(150):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert proj.apply(params, x).shape == (32, 5, 8)
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])
