"""Explicit ICI collectives for code running inside ``shard_map``.

The reference's whole distributed surface is ``gather_features``
(``models/loss.py:20-75``): an all-gather of the two contrastive towers,
grad-preserving when ``torch.distributed.nn.all_gather`` is used. In JAX the
same thing is one differentiable primitive — ``jax.lax.all_gather`` — whose
transpose is a reduce-scatter over the same ICI ring, so the "splice the
local shard back in for gradients" dance (``models/loss.py:59-73``) is
unnecessary by construction.

These helpers only make sense inside ``shard_map``/``pmap`` bodies; under
plain GSPMD ``jit`` you never call them — XLA inserts equivalent collectives
from the sharding annotations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_features(
    feat_a: jax.Array,
    feat_b: jax.Array,
    axis: str = "dp",
) -> tuple[jax.Array, jax.Array]:
    """All-gather both feature towers over the mesh axis (grad-preserving).

    Equivalent of ref ``gather_features(..., gather_with_grad=True)``
    (``models/loss.py:52-58``): returns (N_global, D) arrays on every device.
    """
    return (
        jax.lax.all_gather(feat_a, axis, tiled=True),
        jax.lax.all_gather(feat_b, axis, tiled=True),
    )


def pmean_tree(tree, axis: str = "dp"):
    """psum-mean a pytree (grad sync for data-parallel shard_map steps)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)


def global_batch_stats(x: jax.Array, axis: str = "dp") -> tuple[jax.Array, jax.Array]:
    """Cross-device mean/var along the batch axis, for sync batch-norm."""
    n_local = x.shape[0]
    n_global = n_local * jax.lax.psum(1, axis)
    mean = jax.lax.psum(jnp.sum(x, axis=0), axis) / n_global
    sq_mean = jax.lax.psum(jnp.sum(x * x, axis=0), axis) / n_global
    return mean, sq_mean - mean * mean
