"""Tests for the vectorized k-way retrieval evaluator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg_image_decode_tpu.train.evaluator import kway_accuracy, retrieval_eval


def test_perfect_features_give_perfect_accuracy(rng):
    n_cls = 50
    feats = np.eye(n_cls, 64, dtype=np.float32)
    labels = jnp.arange(n_cls)
    logits = jnp.asarray(feats @ feats.T)
    for k in (2, 10, n_cls):
        accs = kway_accuracy(logits, labels, k, jax.random.key(0))
        assert float(accs["top1"]) == 1.0


def test_chance_level_random_features(rng):
    """Random features → top-1 ≈ 1/k (the reference's dashed chance line)."""
    n, n_cls = 2000, 100
    logits = jnp.asarray(rng.normal(size=(n, n_cls)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, n_cls, size=n).astype(np.int32))
    for k, tol in ((2, 0.05), (10, 0.03), (100, 0.01)):
        accs = kway_accuracy(logits, labels, k, jax.random.key(1))
        assert abs(float(accs["top1"]) - 1.0 / k) < tol, (k, float(accs["top1"]))


def test_full_kway_is_deterministic(rng):
    logits = jnp.asarray(rng.normal(size=(20, 20)).astype(np.float32))
    labels = jnp.arange(20)
    a = kway_accuracy(logits, labels, 20, top5=True)
    b = kway_accuracy(logits, labels, 20, top5=True)
    assert float(a["top1"]) == float(b["top1"])
    assert "top5" in a


def test_sampled_kway_seeded_reproducible(rng):
    logits = jnp.asarray(rng.normal(size=(50, 200)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 200, size=50).astype(np.int32))
    a = kway_accuracy(logits, labels, 10, jax.random.key(42))
    b = kway_accuracy(logits, labels, 10, jax.random.key(42))
    c = kway_accuracy(logits, labels, 10, jax.random.key(43))
    assert float(a["top1"]) == float(b["top1"])
    # different seed may differ (not guaranteed, but these sizes make it so)
    assert a["top1"].shape == c["top1"].shape


def test_true_class_always_in_distractor_set(rng):
    """If the model is perfect, sampled k-way must be perfect for every seed —
    i.e. the true class is always a candidate (ref behavior: random.sample of
    the *other* classes + [label], ATMS_retrieval.py:300)."""
    n_cls = 30
    logits = jnp.asarray(10 * np.eye(n_cls, dtype=np.float32))
    labels = jnp.arange(n_cls)
    for seed in range(5):
        accs = kway_accuracy(logits, labels, 4, jax.random.key(seed))
        assert float(accs["top1"]) == 1.0


def test_sampled_requires_key(rng):
    logits = jnp.zeros((4, 10))
    with pytest.raises(ValueError):
        kway_accuracy(logits, jnp.zeros(4, jnp.int32), 2)


def test_retrieval_eval_protocol_keys(rng):
    feats = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    cls_feats = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    labels = jnp.arange(200)
    out = retrieval_eval(feats, cls_feats, labels, key=jax.random.key(0))
    # top-1 at every k, top-5 only for k>=50 (ref :397-402)
    assert set(out) == {
        "top1_k2", "top1_k4", "top1_k10",
        "top1_k50", "top5_k50", "top1_k100", "top5_k100",
        "top1_k200", "top5_k200",
    }
    # monotone: larger k is harder
    assert out["top1_k2"] >= out["top1_k50"] >= out["top1_k200"]
