"""Golden tests for the contrastive loss.

Parity target (SURVEY.md §4): ClipLoss value on fixed inputs. The oracle is an
independent numpy implementation of the published formula
L = (CE(s·A@Bᵀ, arange) + CE(s·B@Aᵀ, arange))/2, cross-checked once against
torch.nn.functional.cross_entropy (torch CPU is available in this image).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg_image_decode_tpu.losses import (
    clip_loss,
    clip_loss_distributed,
    reconstruction_loss,
    retrieval_loss,
)


def _np_ce_arange(logits):
    logits = logits.astype(np.float64)
    m = logits.max(axis=1, keepdims=True)
    logz = m[:, 0] + np.log(np.exp(logits - m).sum(axis=1))
    return float(np.mean(logz - np.diagonal(logits)))


def _np_clip_loss(a, b, scale):
    logits = scale * a @ b.T
    return 0.5 * (_np_ce_arange(logits) + _np_ce_arange(logits.T))


def test_clip_loss_matches_numpy_oracle(rng):
    a = rng.normal(size=(16, 32)).astype(np.float32)
    b = rng.normal(size=(16, 32)).astype(np.float32)
    scale = np.float32(np.log(1 / 0.07))
    got = clip_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(scale))
    want = _np_clip_loss(a, b, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_clip_loss_matches_torch_cross_entropy(rng):
    torch = pytest.importorskip("torch")
    a = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(8, 16)).astype(np.float32)
    scale = 2.0
    ta, tb = torch.tensor(a), torch.tensor(b)
    logits = scale * ta @ tb.T
    labels = torch.arange(8)
    want = 0.5 * (
        torch.nn.functional.cross_entropy(logits, labels)
        + torch.nn.functional.cross_entropy(logits.T, labels)
    )
    got = clip_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(scale))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_perfect_alignment_beats_random(rng):
    a = rng.normal(size=(32, 64)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    aligned = clip_loss(jnp.asarray(a), jnp.asarray(a), jnp.asarray(10.0))
    shuffled = clip_loss(
        jnp.asarray(a), jnp.asarray(np.roll(a, 1, axis=0)), jnp.asarray(10.0)
    )
    assert float(aligned) < float(shuffled)


def test_distributed_global_equals_single_device(mesh8, rng):
    a = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(32, 16)).astype(np.float32)
    scale = jnp.asarray(2.659)
    single = clip_loss(jnp.asarray(a), jnp.asarray(b), scale)
    dist = clip_loss_distributed(
        jnp.asarray(a), jnp.asarray(b), scale, mesh=mesh8, axis="dp"
    )
    np.testing.assert_allclose(np.asarray(dist), np.asarray(single), rtol=1e-5)


def test_distributed_local_loss_equals_global(mesh8, rng):
    """The reference's local_loss variant (models/loss.py:113-130) computes the
    same scalar as the global variant when every rank holds the full labels."""
    a = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(32, 16)).astype(np.float32)
    scale = jnp.asarray(1.3)
    glob = clip_loss_distributed(
        jnp.asarray(a), jnp.asarray(b), scale, mesh=mesh8, axis="dp"
    )
    loc = clip_loss_distributed(
        jnp.asarray(a), jnp.asarray(b), scale, mesh=mesh8, axis="dp", local_loss=True
    )
    np.testing.assert_allclose(np.asarray(loc), np.asarray(glob), rtol=1e-5)


def test_distributed_gradients_match_single_device(mesh8, rng):
    """Grad-preserving all-gather: d(loss)/d(features) must equal the
    single-device gradient (the torch.distributed.nn.all_gather guarantee)."""
    a = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(16, 8)).astype(np.float32)
    scale = jnp.asarray(2.0)

    g_single = jax.grad(lambda x: clip_loss(x, jnp.asarray(b), scale))(jnp.asarray(a))
    g_dist = jax.grad(
        lambda x: clip_loss_distributed(x, jnp.asarray(b), scale, mesh=mesh8)
    )(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_single), rtol=1e-4, atol=1e-6)


def test_retrieval_loss_alpha_mix(rng):
    e = rng.normal(size=(8, 8)).astype(np.float32)
    i = rng.normal(size=(8, 8)).astype(np.float32)
    t = rng.normal(size=(8, 8)).astype(np.float32)
    s = jnp.asarray(1.0)
    mixed = retrieval_loss(jnp.asarray(e), jnp.asarray(i), jnp.asarray(t), s, alpha=0.99)
    want = 0.99 * _np_clip_loss(e, i, 1.0) + 0.01 * _np_clip_loss(e, t, 1.0)
    np.testing.assert_allclose(np.asarray(mixed), want, rtol=1e-5)


def test_reconstruction_loss_formula(rng):
    e = rng.normal(size=(8, 8)).astype(np.float32)
    i = rng.normal(size=(8, 8)).astype(np.float32)
    s = jnp.asarray(1.0)
    got = reconstruction_loss(jnp.asarray(e), jnp.asarray(i), s, alpha=0.9)
    want = 0.9 * np.mean((e - i) ** 2) * 10 + 0.1 * _np_clip_loss(e, i, 1.0) * 10
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_three_way_loss_and_grad_parity_on_mesh(mesh8, rng):
    """VERDICT item 10: GSPMD (jit over batch-sharded inputs), explicit
    shard_map local_loss, and plain single-device must agree on identical
    data — both the loss value and its gradients w.r.t. the features."""
    from eeg_image_decode_tpu.core.mesh import batch_sharding

    a = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(32, 16)).astype(np.float32)
    scale = jnp.float32(2.0)

    # single-device reference
    ref_loss, (ref_ga, ref_gb) = jax.value_and_grad(clip_loss, argnums=(0, 1))(
        jnp.asarray(a), jnp.asarray(b), scale
    )

    # GSPMD: same function, batch-sharded operands under jit
    sh = batch_sharding(mesh8)
    a_sh = jax.device_put(a, sh)
    b_sh = jax.device_put(b, sh)
    gspmd = jax.jit(jax.value_and_grad(clip_loss, argnums=(0, 1)))
    g_loss, (g_ga, g_gb) = gspmd(a_sh, b_sh, scale)

    # explicit shard_map with the reference's local_loss variant
    def local(a, b):
        return clip_loss_distributed(
            a, b, scale, mesh=mesh8, axis="dp", local_loss=True
        )

    l_loss, (l_ga, l_gb) = jax.jit(
        jax.value_and_grad(local, argnums=(0, 1))
    )(a_sh, b_sh)

    np.testing.assert_allclose(float(g_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(float(l_loss), float(ref_loss), rtol=1e-6)
    for got, want in ((g_ga, ref_ga), (g_gb, ref_gb), (l_ga, ref_ga),
                      (l_gb, ref_gb)):
        np.testing.assert_allclose(np.asarray(jax.device_get(got)),
                                   np.asarray(jax.device_get(want)),
                                   atol=1e-6, rtol=1e-5)
