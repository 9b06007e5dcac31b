"""CLIP-style symmetric InfoNCE, single-device and mesh-distributed.

Reference semantics (``models/loss.py:78-141``): given feature matrices A, B
of shape (N, D) and a scalar ``logit_scale`` (already exponentiated by the
caller — the reference stores log-scale as a parameter and multiplies its
exp), the loss is

    L = (CE(s·A@Bᵀ, arange(N)) + CE(s·B@Aᵀ, arange(N))) / 2

Features are used as-is (the reference does NOT re-normalize inside the loss;
image features arrive pre-normalized from the cache, EEG features arrive
straight from the projector).

Distributed story: the reference optionally all-gathers features across ranks
via ``torch.distributed.nn.all_gather`` (grad-preserving) before computing a
global-batch loss (``models/loss.py:20-75``) — default-off in every script.
On TPU there are two first-class routes:

1. **GSPMD (default)**: compute the loss on batch-sharded features under
   ``jit``. XLA sees ``A @ Bᵀ`` with both operands sharded on the batch axis
   and inserts the ICI all-gather itself; the backward pass gets the matching
   reduce-scatter. No hand-written collectives — this is ``clip_loss`` used
   inside a sharded train step.
2. **Explicit shard_map** (``clip_loss_distributed``): a per-device function
   with a visible ``jax.lax.all_gather`` over the mesh axis, including the
   reference's ``local_loss`` variant (local logits vs. the gathered other
   tower, labels offset by ``rank * local_batch`` — ``models/loss.py:113-130``).
   ``jax.lax.all_gather`` is differentiable (transpose = psum_scatter), which
   is exactly the grad-preserving gather the reference gets from
   ``torch.distributed.nn.all_gather``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map


def _cross_entropy_with_arange(logits: jax.Array) -> jax.Array:
    """Mean cross-entropy with labels = arange(N) (the InfoNCE diagonal).

    Computed in fp32 regardless of the logits dtype: the logsumexp over a
    large gathered batch is precision-sensitive while the matmul that
    produced the logits is happy in bf16.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    diag = jnp.diagonal(logits)
    return jnp.mean(logz - diag)


def symmetric_infonce(feat_a: jax.Array, feat_b: jax.Array, scale: jax.Array) -> jax.Array:
    """Both-direction InfoNCE (ref ``models/loss.py:122-140``, world_size=1)."""
    logits_ab = scale * jnp.dot(
        feat_a, feat_b.T, preferred_element_type=jnp.float32
    )
    # logits_ba is logits_abᵀ with the same scale; reuse the matmul.
    return 0.5 * (
        _cross_entropy_with_arange(logits_ab)
        + _cross_entropy_with_arange(logits_ab.T)
    )


def clip_loss(feat_a: jax.Array, feat_b: jax.Array, logit_scale: jax.Array) -> jax.Array:
    """ClipLoss.forward, world_size=1 path (``models/loss.py:121-141``).

    ``logit_scale`` is used directly as the multiplier. NOTE a reference
    quirk preserved on purpose: the models there store
    ``logit_scale = Parameter(ln(1/0.07))`` and pass the **raw parameter**
    (never ``.exp()``) into the loss (``Retrieval/ATMS_retrieval.py:227-229``),
    so the effective temperature starts at ≈2.659 and is itself trained.
    Models in this framework expose the same raw trainable scalar; set
    ``exp_logit_scale=True`` on the model for standard-CLIP behavior.
    """
    return symmetric_infonce(feat_a, feat_b, logit_scale)


def retrieval_loss(
    eeg_feat: jax.Array,
    img_feat: jax.Array,
    text_feat: jax.Array,
    scale: jax.Array,
    alpha: float = 0.99,
) -> jax.Array:
    """Retrieval objective: 0.99·img_clip + 0.01·text_clip
    (ref ``Retrieval/ATMS_retrieval.py:206,229-234``)."""
    img_loss = symmetric_infonce(eeg_feat, img_feat, scale)
    text_loss = symmetric_infonce(eeg_feat, text_feat, scale)
    return alpha * img_loss + (1.0 - alpha) * text_loss


def reconstruction_loss(
    eeg_feat: jax.Array,
    img_feat: jax.Array,
    scale: jax.Array,
    alpha: float = 0.90,
) -> jax.Array:
    """Reconstruction objective: α·MSE·10 + (1−α)·img_clip·10 against
    *unnormalized* CLIP targets (ref ``Generation/ATMS_reconstruction.py:198,227-228``)."""
    mse = jnp.mean(
        (eeg_feat.astype(jnp.float32) - img_feat.astype(jnp.float32)) ** 2
    )
    img_clip = symmetric_infonce(eeg_feat, img_feat, scale)
    return alpha * mse * 10.0 + (1.0 - alpha) * img_clip * 10.0


def clip_loss_distributed(
    feat_a: jax.Array,
    feat_b: jax.Array,
    logit_scale: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "dp",
    local_loss: bool = False,
) -> jax.Array:
    """Mesh-wide InfoNCE with an explicit grad-preserving all-gather over ICI.

    Mirrors ``gather_features`` + global/local logits (``models/loss.py:20-130``):

    - global (default): every device gathers both towers and computes the full
      (N_global, N_global) loss — identical value on all devices.
    - local: each device computes only its (N_local, N_global) block against
      the gathered opposite tower; labels are ``arange(N_local) + rank·N_local``.

    Inputs are the *global* feature arrays (batch-sharded or shardable over
    ``axis``); output is the replicated scalar loss.
    """

    def _per_device(a: jax.Array, b: jax.Array, scale: jax.Array) -> jax.Array:
        all_a = jax.lax.all_gather(a, axis, tiled=True)
        all_b = jax.lax.all_gather(b, axis, tiled=True)
        if local_loss:
            rank = jax.lax.axis_index(axis)
            n_local = a.shape[0]
            logits_ab = scale * jnp.dot(
                a, all_b.T, preferred_element_type=jnp.float32
            )
            logits_ba = scale * jnp.dot(
                b, all_a.T, preferred_element_type=jnp.float32
            )
            offset = rank * n_local
            labels = jnp.arange(n_local) + offset

            def ce(logits):
                logits = logits.astype(jnp.float32)
                logz = jax.nn.logsumexp(logits, axis=-1)
                picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
                return jnp.sum(logz - picked)

            # mean over the global batch = psum of per-device sums / N_global
            n_global = all_a.shape[0]
            loss = 0.5 * (ce(logits_ab) + ce(logits_ba)) / n_global
            return jax.lax.psum(loss, axis)
        return symmetric_infonce(all_a, all_b, scale)

    fn = shard_map(
        _per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(feat_a, feat_b, logit_scale)
