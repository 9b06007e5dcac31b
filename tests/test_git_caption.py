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


def test_generate_is_one_cached_program():
    """The decode loop must compile ONCE per (config, budget, shapes) —
    eager per-op dispatch made the full-size decode 944 ms vs 34 ms jitted
    on a remote-device host (docs/PERF.md)."""
    from eeg_image_decode_tpu.models.git_caption import _decode_jit

    cfg, model, v, vis, _ = _tiny()
    _decode_jit._clear_cache()
    model.generate(v, vis, max_new_tokens=5)
    assert _decode_jit._cache_size() == 1
    model.generate(v, vis, max_new_tokens=5)  # same shapes → no retrace
    assert _decode_jit._cache_size() == 1
    model.generate(v, vis, max_new_tokens=4)  # new budget → one new trace
    assert _decode_jit._cache_size() == 2


def test_pixel_projector_learns_mapping(rng):
    """Train the adapter with MSE exactly like image_adapter.ipynb cell 3:
    CLIP ViT-H embedding → GIT visual token grid. The target is produced by
    a reference-shaped adapter (token expansion ⊗ channel mix), which the
    factorized module must be able to fit."""
    from eeg_image_decode_tpu.train.adapters import (
        AdapterTrainConfig,
        evaluate_pixel_projector,
        train_pixel_projector,
    )

    x = rng.normal(size=(64, 16)).astype(np.float32)
    w_tok = rng.normal(size=(1, 5)).astype(np.float32)
    w_mix = rng.normal(size=(16, 8)).astype(np.float32)
    target = np.einsum("bd,ut,do->bto", x, w_tok, w_mix)
    target = (target - target.mean()) / target.std()

    params, losses = train_pixel_projector(
        x, target,
        AdapterTrainConfig(epochs=120, batch_size=32, lr=1e-2, seed=0),
        dtype=jnp.float32,
    )
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])
    held = evaluate_pixel_projector(params, x, target, dtype=jnp.float32)
    assert held < 0.3 * losses[0]
    proj = PixelProjector(num_tokens=5, out_dim=8)
    assert proj.apply({"params": params}, jnp.asarray(x)).shape == (64, 5, 8)
