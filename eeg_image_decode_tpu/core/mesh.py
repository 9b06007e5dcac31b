"""Device mesh and sharding helpers.

The reference has no mesh concept — its distributed surface is one optional
NCCL all-gather (``models/loss.py:20-75``). Here the mesh is the foundation:
every trainer takes a `jax.sharding.Mesh` and shards the batch over the data
axis; XLA/GSPMD inserts the ICI collectives (all-gathers of the contrastive
embeddings, psums of the grads).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    *,
    data_axis: str = "dp",
    model_axis: str = "mp",
    devices=None,
) -> Mesh:
    """Build a (dp, mp) mesh over the available devices.

    ``data_parallel=-1`` consumes all remaining devices. On a single chip this
    degenerates to a 1x1 mesh so the same trainer code path runs everywhere.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs "
            f"{data_parallel * model_parallel} devices, have {n}"
        )
    grid = np.asarray(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the data-parallel mesh axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, data_axis: str = "dp"):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "dp") -> int:
    dp = mesh.shape[data_axis]
    if global_batch % dp != 0:
        raise ValueError(f"global batch {global_batch} not divisible by dp={dp}")
    return global_batch // dp


def validate_dp_batch(
    mesh: Mesh | None, batch_size: int, data_axis: str = "dp"
) -> None:
    """Fail fast (with a readable message) before jit raises an opaque GSPMD
    sharding error on a batch that doesn't divide the dp axis."""
    if mesh is None:
        return
    dp = mesh.shape.get(data_axis, 1)
    if batch_size % dp != 0:
        raise ValueError(
            f"batch_size={batch_size} must divide the data-parallel axis "
            f"({data_axis}={dp}) — pick a multiple of {dp}"
        )


def dp_epoch_jit(epoch_fn, mesh: Mesh, *, n_args: int, perm_index: int,
                 donate=(0,), data_axis: str = "dp"):
    """jit an epoch function under the trainers' shared dp scheme: every
    argument replicated except the (n_steps, batch) index array at
    ``perm_index``, which shards its batch dimension over ``data_axis``
    (state and HBM-resident data replicate; GSPMD inserts the grad
    all-reduce). Used by the contrastive, prior, and low-level trainers."""
    repl = replicated_sharding(mesh)
    perm = NamedSharding(mesh, P(None, data_axis))
    in_shardings = tuple(
        perm if i == perm_index else repl for i in range(n_args)
    )
    return jax.jit(
        epoch_fn,
        donate_argnums=donate,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
    )
