"""Zero-shot k-way retrieval evaluation, fully vectorized.

The reference evaluates per *sample* in a Python loop with unseeded
``random.sample`` distractors (``Retrieval/ATMS_retrieval.py:296-357``) — its
second hot spot. Here the whole protocol is one jitted computation:

- one (N, D) @ (D, n_cls) matmul for all logits,
- full n_cls-way top-1/top-5 as masked argmax,
- sampled k-way via the Gumbel-top-k trick: per sample, draw gumbel noise
  over classes, force the true class in, take the top-k noise positions as
  the candidate set — an exact uniform sample of k−1 distractors without
  replacement, but batched and reproducible under a jax PRNG key.

Following the reference's protocol, top-5 is computed only for k ≥ 50
(``:397-402``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _topk_contains(sel_logits: jax.Array, sel_classes: jax.Array,
                   labels: jax.Array, k: int) -> jax.Array:
    _, idx = jax.lax.top_k(sel_logits, k)
    top_classes = jnp.take_along_axis(sel_classes, idx, axis=1)
    return jnp.any(top_classes == labels[:, None], axis=1)


def kway_accuracy(
    logits: jax.Array,
    labels: jax.Array,
    k: int,
    key: jax.Array | None = None,
    *,
    top5: bool | None = None,
) -> dict[str, jax.Array]:
    """Top-1 (and top-5) accuracy of k-way retrieval.

    ``logits``: (N, n_cls) similarity of each test sample to every class
    image; ``labels``: (N,) true class ids. ``k == n_cls`` → deterministic
    full protocol; ``k < n_cls`` needs ``key`` for distractor sampling.
    """
    n, n_cls = logits.shape
    if top5 is None:
        top5 = k >= 50  # ref computes top-5 only at k ∈ {50,100,200} (:397-402)
    if k == n_cls:
        pred = jnp.argmax(logits, axis=1)
        out = {"top1": jnp.mean((pred == labels).astype(jnp.float32))}
        if top5:
            _, top5_idx = jax.lax.top_k(logits, 5)
            out["top5"] = jnp.mean(
                jnp.any(top5_idx == labels[:, None], axis=1).astype(jnp.float32)
            )
        return out

    if key is None:
        raise ValueError("sampled k-way evaluation requires a PRNG key")
    g = jax.random.gumbel(key, (n, n_cls))
    g = g.at[jnp.arange(n), labels].set(jnp.inf)  # true class always in set
    _, sel = jax.lax.top_k(g, k)  # (N, k) uniform distractor sets
    sel_logits = jnp.take_along_axis(logits, sel, axis=1)
    pred = jnp.take_along_axis(
        sel, jnp.argmax(sel_logits, axis=1, keepdims=True), axis=1
    )[:, 0]
    out = {"top1": jnp.mean((pred == labels).astype(jnp.float32))}
    if top5:
        out["top5"] = jnp.mean(
            _topk_contains(sel_logits, sel, labels, 5).astype(jnp.float32)
        )
    return out


def retrieval_eval(
    eeg_features: jax.Array,
    class_img_features: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array | float = 1.0,
    ks: tuple[int, ...] = (2, 4, 10, 50, 100, 200),
    key: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Run the full evaluation protocol at every k.

    Note the scale does not change any argmax — it is kept only to mirror the
    reference's logits (``:306``).
    """
    n_cls = class_img_features.shape[0]
    logits = logit_scale * jnp.dot(
        eeg_features, class_img_features.T, preferred_element_type=jnp.float32
    )
    out: dict[str, jax.Array] = {}
    if key is None:
        key = jax.random.key(0)
    for i, k in enumerate(ks):
        if k > n_cls:
            continue
        accs = kway_accuracy(logits, labels, k, jax.random.fold_in(key, i))
        out[f"top1_k{k}"] = accs["top1"]
        if "top5" in accs:
            out[f"top5_k{k}"] = accs["top5"]
    return out
